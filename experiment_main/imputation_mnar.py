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
    restrict_grid_records,
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
    if bool(getattr(probe, "ensemble", False)):
        # -ensemble true: each record's (missing x alpha x seed) product
        # trains as ONE vmapped program — the MCAR suite's sweep-ensemble
        # machinery on the MNAR pipeline (imputation.py's flag matrix)
        print("[ensemble mode] MNAR sweeps run as vmapped ensembles; PRNG "
              "streams differ from the serial path (PARITY.md deviation "
              "#8)", flush=True)
        # `-vae_type` restricts the grid in ensemble mode (shared helper;
        # the serial nest keeps the reference's override-per-record parse)
        records = restrict_grid_records(records, probe)
        for record in records:
            _run_sweep_ensemble(record, missings, alphas)
        return
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


def _run_sweep_ensemble(record, missings, alphas):
    """`-ensemble true`: this MNAR record's full (missing-rate x alpha x
    seed) product trained as ONE vmapped program
    (parallel/sweep.train_sweep_ensemble — the MCAR suite's machinery; row
    (mi * A + ai) * S + si holds (missings[mi], alphas[ai], seed si)), then
    evaluated in one compiled MNAR pass PER RATE. The per-rate grouping
    pairs each rate's own TRAINED checkpoints under one shared-cfg vmapped
    program; every family's eval_step imputes from the q branch only, so
    the cfg-rated mask_p stream is inert in the RMSE itself and the second
    rate hits the compiled-program cache (one dispatch, not one compile).
    Vanilla configs are alpha/rate-free in training and mask_p-free in
    MNAR imputation, so their sweep axes collapse to the first cell
    (trained + evaluated once per seed — the reference's serial loops
    would retrain them per cell, src/experiment_main/imputation_mnar.py:
    30-31). Checkpoints land at the reference-mangled per-(alpha, rate)
    paths with `.seed{s}` siblings; each reg cell's seed-0 RMSE is written
    to its reference artifact path (artifacts.eval_mnar_paths embeds alpha
    + p_missingness in reg names and neither in vanilla ones)."""
    import numpy as _np

    from vae_posterior_consistency_tpu.engine import artifacts, checkpoint
    from vae_posterior_consistency_tpu.parallel import sweep

    args = setup_parser(record, "impute_eval").parse_args()
    cfg = RunConfig.from_args(args, alpha=alphas[0],
                              p_missingness=missings[0],
                              data_transform=DATA_TRANSFORM,
                              not_miwae_type=NOT_MIWAE_TYPE)
    apply_rng_impl(cfg)
    dataset = loaders.data_loader_mnar(cfg.data_path, cfg.vae_type,
                                       cfg.missing_rate, cfg.batch_size,
                                       cfg.data_type,
                                       data_transform=DATA_TRANSFORM)
    mesh = resolve_mesh(cfg)
    tag = f" mesh={dict(mesh.shape)}" if mesh is not None else ""
    n_seeds = max(1, int(getattr(args, "seeds", 1)))
    seeds = [cfg.seed + s for s in range(n_seeds)] if n_seeds > 1 else None
    reg = cfg.info.regularized
    cfg_miss = list(missings) if reg else list(missings[:1])
    cfg_alphas = list(alphas) if reg else list(alphas[:1])
    note = "" if reg else " (vanilla: alpha/rate-free, one cell)"
    seed_tag = f", seeds={n_seeds}" if n_seeds > 1 else ""
    print(f"=== sweep-ensemble train {cfg.vae_type} (MNAR, "
          f"missings={cfg_miss}, alphas={cfg_alphas}{seed_tag}){tag}{note} "
          f"===", flush=True)
    ck, rs = restart_opts(args)
    t0 = time.perf_counter()
    params_ens, hist, rows = sweep.train_sweep_ensemble(
        dataset, cfg, missings=cfg_miss, alphas=cfg_alphas, seeds=seeds,
        mesh=mesh, checkpoint_every=ck, resume=rs,
        resume_path=checkpoint.checkpoint_path(cfg, "experiments")
        + f".mnarsweep{len(cfg_miss) * len(cfg_alphas) * n_seeds}.resume.pt",
        early_stopping=early_stopper(args, cfg, ensemble=True))
    jax.block_until_ready(hist)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    # one stacked device_get + threaded checkpoint writes (the suite save
    # contract, VERDICT r4 item 4); rows then slice on host
    params_host = jax.device_get(params_ens)
    checkpoint.save_many(
        (sweep.ensemble_replica(params_host, ri),
         checkpoint.checkpoint_path(
             cfg.replace(alpha=a, p_missingness=m), "experiments")
         + checkpoint.seed_suffix(0 if s is None else int(s) - cfg.seed))
        for ri, (m, a, s) in enumerate(rows))
    S = n_seeds
    for m in cfg_miss:
        ids = [ri for ri, (rm, _a, _s) in enumerate(rows) if rm == m]
        sub = jax.tree_util.tree_map(lambda l: l[_np.asarray(ids)],
                                     params_host)
        rmses = eval_engine.eval_vae_mnar_ensemble(
            dataset.train.x, dataset.train.mask,
            cfg.replace(p_missingness=m), sub, save=False)
        for ai, a in enumerate(cfg_alphas):
            cell = _np.asarray(rmses[ai * S:(ai + 1) * S])
            cfg_ma = cfg.replace(alpha=a, p_missingness=m)
            # seed-0 keeps the reference artifact contract per cell
            paths = artifacts.eval_mnar_paths(cfg_ma, "experiments")
            artifacts.save_tensor(float(cell[0]), paths["rmse"])
            artifacts.log_metric(cfg_ma, "rmse_mnar", float(cell[0]),
                                 "test", "experiments")
            line = (f"rmse={cell.mean():.5f}±{cell.std():.5f}  "
                    + " ".join(f"s{si}={v:.5f}"
                               for si, v in enumerate(cell))
                    if n_seeds > 1 else f"rmse={float(cell[0]):.5f}")
            print(f"  missing={m} alpha={a:g} {line}")
    print(f"  [timing] train {t_train:.1f}s  eval+save "
          f"{time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
