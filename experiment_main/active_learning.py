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
import numpy as np

from vae_posterior_consistency_tpu.config import (
    RunConfig,
    apply_rng_impl,
    iter_jsonl_configs,
    maybe_profile,
    resolve_mesh,
    parse_alphas,
    parse_missings,
    restrict_grid_records,
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
    ensemble = bool(getattr(probe, "ensemble", False))
    if ensemble:
        # `-vae_type` restricts the grid in ensemble mode (shared helper;
        # the serial loop keeps the reference's override-per-record parse)
        records = restrict_grid_records(records, probe)
    for record in records:
        if ensemble:
            # -ensemble true: the (alpha x seed) episode replicas run as
            # ONE vmapped program per missing rate (imputation.py's flag
            # matrix, on the AL pipeline)
            _run_sweep_ensemble(record, missings, alphas)
            continue
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


def _run_sweep_ensemble(record, missings, alphas):
    """`-ensemble true`: this record's (alpha x seed) pre-trained episode
    replicas run as ONE vmapped program PER MISSING RATE.

    NEITHER swept knob enters the episode math: the rewards are
    encoder-KL / flow log-prob ratios (engine/active_learning.py never
    reads cfg.alpha), and every family's eval_step imputes from the
    q branch only, so the engine's cfg.p_missingness-rated mask_p stream
    is "computed but unused by the reward" (engine comment) — the knobs
    matter solely through WHICH trained checkpoint a replica loads (reg
    checkpoint names embed both). Rates are grouped one engine call per
    rate only because cfg parameterizes that (inert) mask_p stream; the
    second rate hits the compiled-program cache, so the grouping costs one
    dispatch, not one compile. Row order within a call: alpha-major,
    seed-minor (row ai * n_seeds + si). Consequence worth knowing: a
    VANILLA config (one checkpoint regardless of knobs) reports identical
    episodes at every rate — that is correct, not a bug.

    Vanilla configs are alpha-free in their checkpoint names, so their
    alpha axis collapses to one cell; their AL artifact names carry neither
    alpha nor p_missingness (artifacts.active_learning_paths), so with a
    swept `-missings` only the FIRST rate's artifacts are written (the
    reference contract has one artifact set per config) — every rate's
    metrics still print. Reg cells save at their own reference paths
    (names embed alpha + p_missingness) with `.seed{s}` siblings."""
    from vae_posterior_consistency_tpu.engine import artifacts, checkpoint
    from vae_posterior_consistency_tpu.models import get_model

    args = setup_parser(record, "impute_eval").parse_args()
    cfg0 = RunConfig.from_args(args, alpha=alphas[0],
                               p_missingness=missings[0])
    apply_rng_impl(cfg0)
    ds = loaders.data_loader(cfg0.data_path, cfg0.vae_type,
                             cfg0.missing_rate, cfg0.batch_size,
                             cfg0.data_type)
    mesh = resolve_mesh(cfg0)
    tag = f" mesh={dict(mesh.shape)}" if mesh is not None else ""
    n_seeds = max(1, int(getattr(args, "seeds", 1)))
    reg = cfg0.info.regularized
    cfg_alphas = list(alphas) if reg else list(alphas[:1])
    model = get_model(cfg0)
    note = "" if reg else " (vanilla: alpha-free checkpoints, one cell)"
    seed_tag = f", seeds={n_seeds}" if n_seeds > 1 else ""
    print(f"=== active learning {cfg0.vae_type} (ensemble, "
          f"missings={list(missings)}, alphas={cfg_alphas}{seed_tag})"
          f"{tag}{note} ===", flush=True)
    import jax.numpy as jnp

    for mi, m in enumerate(missings):
        # stack the (alpha x seed) replica checkpoints for this rate
        parts = [checkpoint.load_seed_ensemble(
            cfg0.replace(alpha=a, p_missingness=m), model, ds.obs_dim,
            n_seeds) for a in cfg_alphas]
        params_ens = jax.tree_util.tree_map(
            lambda *ls: jnp.concatenate(ls, axis=0), *parts)
        t0 = time.perf_counter()
        out = al_engine.active_learning_ensemble(
            np.asarray(ds.test.x), np.asarray(ds.test.mask),
            cfg0.replace(p_missingness=m), params_ens, Repeat=1, mesh=mesh,
            save=False)
        host = {k: np.asarray(jax.device_get(v)) for k, v in out.items()}
        for ai, a in enumerate(cfg_alphas):
            cfg_ma = cfg0.replace(alpha=a, p_missingness=m)
            finals = host["information_curve"][
                ai * n_seeds:(ai + 1) * n_seeds, 0, 0, -1]
            line = (f"final target-MSE={finals.mean():.5f}"
                    f"±{finals.std():.5f}  "
                    + " ".join(f"s{si}={v:.5f}"
                               for si, v in enumerate(finals))
                    if n_seeds > 1
                    else f"final target-MSE={float(finals[0]):.5f}")
            print(f"  missing={m} alpha={a:g} {line}")
            if reg or mi == 0:  # vanilla artifact names carry neither knob
                paths = artifacts.active_learning_paths(cfg_ma,
                                                        "experiments")
                for si in range(n_seeds):
                    r = ai * n_seeds + si
                    for name in ("information_curve", "action", "R_hist",
                                 "im"):
                        artifacts.save_tensor(
                            host[name][r],
                            paths[name] + checkpoint.seed_suffix(si))
                artifacts.log_metric(
                    cfg_ma, "al_final_mse",
                    host["information_curve"][ai * n_seeds, :, 0, -1],
                    "test", "experiments")
        print(f"  [timing] missing={m} "
              f"{len(cfg_alphas) * n_seeds}-replica episode "
              f"{time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
