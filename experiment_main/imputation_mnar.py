"""MNAR imputation experiment entry point.

CLI-compatible rebuild of the reference driver
(reference: src/experiment_main/imputation_mnar.py:27-85): iterates
Data/imputation_args_mnar.json, trains the notMIWAE-family models on the
MNAR-permuted data (target column dropped), then evaluates full-matrix
imputation RMSE with eval_vae_mnar and writes the reference-named artifacts.

Run:  PYTHONPATH=. python3 experiment_main/imputation_mnar.py [-vae_type ...]
"""

import os
import sys
import time

# repo-checkout layout only: make the package importable when run as a
# script. Installed (this module living under the package as
# vae_posterior_consistency_tpu.experiment_main), the parent dir is the
# package itself and must NOT go on sys.path (its subpackages would shadow
# top-level names like `config`).
_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_parent, "vae_posterior_consistency_tpu")):
    sys.path.insert(0, _parent)

import jax

# opt-in NaN tripwire (the reference's always-on detect_anomaly equivalent —
# PARITY.md documented deviation #7): VPC_DEBUG_NANS=1
from vae_posterior_consistency_tpu.utils.debugging import (
    apply_platform_from_env,
    enable_nan_debugging_from_env,
)

apply_platform_from_env()
enable_nan_debugging_from_env()

from vae_posterior_consistency_tpu.config import (
    RunConfig,
    apply_rng_impl,
    early_stopper,
    iter_jsonl_configs,
    maybe_profile,
    resolve_mesh,
    parse_alphas,
    parse_missings,
    restart_opts,
    setup_parser,
)
from vae_posterior_consistency_tpu.data import loaders
from vae_posterior_consistency_tpu.data.default_configs import write_default_configs
from vae_posterior_consistency_tpu.engine import evaluate as eval_engine
from vae_posterior_consistency_tpu.engine import train as train_engine
from vae_posterior_consistency_tpu.utils.logging import epoch_logger

#: hard-coded sweep axes (reference: src/experiment_main/imputation_mnar.py:30-31)
MISSING_SWEEP = [50]
ALPHA_SWEEP = [1.0]

#: 'minmax' or 'stand'; 'changed' or 'author' — the reference pins these in the
#: script body (src/experiment_main/imputation_mnar.py:38-39)
DATA_TRANSFORM = "minmax"
NOT_MIWAE_TYPE = "changed"


def main():
    print("Devices:", jax.devices())
    write_default_configs("Data")
    records = list(iter_jsonl_configs("Data/imputation_args_mnar.json"))
    probe = setup_parser(records[0], "impute_eval").parse_args()
    with maybe_profile(probe):
        _run_grid(records)


def _run_grid(records):
    probe = setup_parser(records[0], "impute_eval").parse_args()
    alphas = parse_alphas(probe, ALPHA_SWEEP)
    missings = parse_missings(probe, MISSING_SWEEP)
    for record in records:
        for missing in missings:
            for alpha in alphas:
                args = setup_parser(record, "impute_eval").parse_args()
                cfg = RunConfig.from_args(
                    args,
                    alpha=alpha,
                    p_missingness=missing,
                    data_transform=DATA_TRANSFORM,
                    not_miwae_type=NOT_MIWAE_TYPE,
                )
                apply_rng_impl(cfg)
                dataset = loaders.data_loader_mnar(
                    cfg.data_path, cfg.vae_type, cfg.missing_rate,
                    cfg.batch_size, cfg.data_type,
                    data_transform=DATA_TRANSFORM,
                )
                mesh = resolve_mesh(cfg)
                tag = f" mesh={dict(mesh.shape)}" if mesh is not None else ""
                n_seeds = max(1, int(getattr(args, "seeds", 1)))
                ck, rs = restart_opts(args)
                if n_seeds > 1:
                    _run_seed_ensemble(cfg, dataset, mesh, n_seeds, missing,
                                       alpha, tag, checkpoint_every=ck,
                                       resume=rs,
                                       early_stopping=early_stopper(
                                           args, cfg, ensemble=True))
                    continue
                print(f"=== train {cfg.vae_type} (MNAR, missing={missing}, "
                      f"alpha={alpha}){tag} ===", flush=True)
                t0 = time.perf_counter()
                params = None
                if mesh is not None:
                    from vae_posterior_consistency_tpu.parallel.train_parallel import (  # noqa: E501
                        train_sharded,
                    )

                    params, _ = train_sharded(dataset, cfg, mesh, save=True,
                                              checkpoint_every=ck, resume=rs,
                                              early_stopping=early_stopper(
                                                  args, cfg))
                    # MNAR eval is one full-matrix pass x M — cheap; gather
                    # the trained params and reuse the single-program engine
                    params = jax.device_get(params)
                else:
                    train_engine.train(dataset, cfg,
                                       log_fn=epoch_logger(cfg.epoch),
                                       checkpoint_every=ck, resume=rs,
                                       early_stopping=early_stopper(args,
                                                                    cfg))
                t_train = time.perf_counter() - t0
                print(f"=== eval {cfg.vae_type} (MNAR) ===", flush=True)
                t0 = time.perf_counter()
                rmse = eval_engine.eval_vae_mnar(
                    dataset.train.x, dataset.train.mask, cfg, params=params
                )
                print(f"  rmse={rmse:.5f}")
                print(f"  [timing] train {t_train:.1f}s  "
                      f"eval {time.perf_counter() - t0:.1f}s", flush=True)


def _run_seed_ensemble(cfg, dataset, mesh, n_seeds, missing, alpha, tag,
                       checkpoint_every=None, resume=False,
                       early_stopping=None):
    """-seeds N: train N independent seed replicas of this MNAR config as ONE
    vmapped program (parallel/sweep.train_seed_ensemble; replicas dp-shard
    over a mesh with padding), evaluate all replicas in one compiled MNAR
    pass, and report mean±std. Seed 0 keeps the reference checkpoint/artifact
    contract; extra seeds save under .seed{s} suffixes (same convention as
    imputation.py's -ensemble -seeds)."""
    from vae_posterior_consistency_tpu.engine import checkpoint
    from vae_posterior_consistency_tpu.parallel import sweep

    print(f"=== train {cfg.vae_type} (MNAR, missing={missing}, "
          f"alpha={alpha}, seeds={n_seeds}){tag} ===", flush=True)
    t0 = time.perf_counter()
    params_ens, hist = sweep.train_seed_ensemble(
        dataset, cfg, seeds=[cfg.seed + s for s in range(n_seeds)], mesh=mesh,
        checkpoint_every=checkpoint_every, resume=resume,
        resume_path=checkpoint.checkpoint_path(cfg, "experiments")
        + f".seeds{n_seeds}.resume.pt", early_stopping=early_stopping)
    jax.block_until_ready(hist)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    path = checkpoint.checkpoint_path(cfg, "experiments")
    # one stacked device_get; replicas slice on host (VERDICT r4 item 4)
    params_host = jax.device_get(params_ens)
    checkpoint.save_many(
        [(sweep.ensemble_replica(params_host, s),
          path + checkpoint.seed_suffix(s)) for s in range(n_seeds)])
    rmses = eval_engine.eval_vae_mnar_ensemble(
        dataset.train.x, dataset.train.mask, cfg, params_ens)
    mu = float(rmses.mean())
    sd = float(rmses.std())
    print(f"  rmse={mu:.5f}±{sd:.5f}  "
          + " ".join(f"s{s}={v:.5f}" for s, v in enumerate(rmses)))
    print(f"  [timing] train {t_train:.1f}s  "
          f"eval+save {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
