"""Active variable-selection entry point.

CLI-compatible rebuild of the reference driver
(reference: src/experiment_main/active_learning.py:23-74): iterates the MCAR
JSONL configs, loads the raw data/index/mask artifacts directly, min-max
normalizes, and runs the information-reward selection loop on the test split
against the *pre-trained* checkpoint (training is not invoked here, matching
the reference where the train call is commented out, evaluate.py:309-313).

Run:  PYTHONPATH=. python3 experiment_main/active_learning.py [-vae_type ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# opt-in NaN tripwire (the reference's always-on detect_anomaly equivalent —
# PARITY.md documented deviation #7): VPC_DEBUG_NANS=1
from vae_posterior_consistency_tpu.utils.debugging import (
    apply_platform_from_env,
    enable_nan_debugging_from_env,
)

apply_platform_from_env()
enable_nan_debugging_from_env()
import numpy as np

from vae_posterior_consistency_tpu.config import (
    RunConfig,
    apply_rng_impl,
    iter_jsonl_configs,
    maybe_profile,
    resolve_mesh,
    parse_alphas,
    parse_missings,
    setup_parser,
)
from vae_posterior_consistency_tpu.data import loaders
from vae_posterior_consistency_tpu.data.default_configs import write_default_configs
from vae_posterior_consistency_tpu.engine import active_learning as al_engine

MISSING_SWEEP = [30]
ALPHA_SWEEP = [1.0]


def main():
    print("Devices:", jax.devices())
    write_default_configs("Data")
    records = list(iter_jsonl_configs("Data/imputation_args.json"))
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
                cfg = RunConfig.from_args(args, alpha=alpha, p_missingness=missing)
                apply_rng_impl(cfg)
                # one shared data pipeline with training/eval (min-max
                # normalize + test split — reference: active_learning.py:35-53)
                ds = loaders.data_loader(
                    cfg.data_path, cfg.vae_type, cfg.missing_rate,
                    cfg.batch_size, cfg.data_type,
                )
                # -mesh routes the episode dp-sharded over test rows (the
                # reward/imputation math is row-independent; see
                # engine/active_learning.active_learning_func)
                mesh = resolve_mesh(cfg)
                tag = f" mesh={dict(mesh.shape)}" if mesh is not None else ""
                n_seeds = max(1, int(getattr(args, "seeds", 1)))
                if n_seeds > 1:
                    _run_seed_ensemble(cfg, ds, mesh, n_seeds, tag)
                    continue
                print(f"=== active learning {cfg.vae_type}{tag} ===",
                      flush=True)
                t0 = time.perf_counter()
                out = al_engine.active_learning_func(
                    None, np.asarray(ds.test.x), np.asarray(ds.test.mask),
                    cfg, Repeat=1, mesh=mesh
                )
                curve = np.asarray(out["information_curve"])[0, 0, :]
                print("  info curve (target MSE per #revealed): "
                      + " ".join(f"{v:.4f}" for v in curve))
                print(f"  [timing] episode {time.perf_counter() - t0:.1f}s",
                      flush=True)


def _run_seed_ensemble(cfg, ds, mesh, n_seeds, tag):
    """-seeds N: run the AL episode for the config's N seed-replica
    checkpoints (checkpoint.pt + .seed{s} written by `imputation.py
    -ensemble true -seeds N`) as ONE vmapped program
    (engine/active_learning.active_learning_ensemble) and report the final
    target-MSE per seed with mean±std. Raises with the missing path if a
    seed checkpoint was never trained."""
    from vae_posterior_consistency_tpu.engine import checkpoint
    from vae_posterior_consistency_tpu.models import get_model

    print(f"=== active learning {cfg.vae_type} (seeds={n_seeds}){tag} ===",
          flush=True)
    params_ens = checkpoint.load_seed_ensemble(cfg, get_model(cfg),
                                               ds.obs_dim, n_seeds)
    t0 = time.perf_counter()
    out = al_engine.active_learning_ensemble(
        np.asarray(ds.test.x), np.asarray(ds.test.mask), cfg, params_ens,
        Repeat=1, mesh=mesh
    )
    finals = np.asarray(out["information_curve"])[:, 0, 0, -1]
    mu, sd = float(finals.mean()), float(finals.std())
    print(f"  final target-MSE={mu:.5f}±{sd:.5f}  "
          + " ".join(f"s{s}={v:.5f}" for s, v in enumerate(finals)))
    curve0 = np.asarray(out["information_curve"])[0, 0, 0, :]
    print("  seed-0 info curve: " + " ".join(f"{v:.4f}" for v in curve0))
    print(f"  [timing] {n_seeds}-seed episode "
          f"{time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
