"""AIS marginal-likelihood evaluation entry point.

The reference ships its AIS+HMC estimator as a library imported by every entry
script but wired into none of them (reference: src/experiment_main/
imputation.py:11 imports eval_ais; src/utils/AIS.py:80-91). This entry point
makes it a first-class pipeline: evaluate log p(x) for a trained checkpoint
of ANY model family over the train/test splits — the observation likelihood
is selected per family (engine/ais.bridge_for): Gaussian for gauss/flow/
notMIWAE, Student-t for MIWAE.

Run:  PYTHONPATH=. python3 experiment_main/ais_eval.py -vae_type vanilla_vae1 ...
"""

import os
import sys

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
    iter_jsonl_configs,
    maybe_profile,
    resolve_mesh,
    setup_parser,
)
from vae_posterior_consistency_tpu.data import loaders
from vae_posterior_consistency_tpu.data.default_configs import write_default_configs
from vae_posterior_consistency_tpu.engine import ais


def _record_for_vae_type(records, vae_type):
    """Pick the JSONL record whose vae_type matches, so every other default
    (missing_rate, data_type, epochs — the checkpoint-path fields) comes
    from THAT config's grid entry rather than record[0]'s.
    `ais_eval.py -vae_type vanilla_vae1` then finds the checkpoint the
    imputation grid actually wrote (record[0] is a MIWAE config at
    missing_rate=50; vanilla_vae trains at 30). Falls back to record[0] for
    a vae_type outside the grid, same as before."""
    for rec in records:
        if rec["vae_type"]["default"] == vae_type:
            return rec
    return records[0]


def main():
    print("Devices:", jax.devices())
    write_default_configs("Data")
    records = list(iter_jsonl_configs("Data/imputation_args.json"))
    # two-pass parse: argparse itself resolves the requested vae_type
    # (including `-vae_type=x` and unambiguous abbreviations), then the
    # matching record supplies the defaults for the real parse
    probe = setup_parser(records[0], "ais_eval").parse_args()
    record = _record_for_vae_type(records, probe.vae_type)
    args = setup_parser(record, "ais_eval").parse_args()
    cfg = RunConfig.from_args(args)
    apply_rng_impl(cfg)
    dataset = loaders.data_loader(
        cfg.data_path, cfg.vae_type, cfg.missing_rate, cfg.batch_size,
        cfg.data_type,
    )
    # eval_ais builds the cfg.ais_schedule bridge itself; the observation
    # likelihood is per-family (engine/ais.bridge_for).
    # -mesh dp-shards the independent AIS chains (engine/ais.ais_batch).
    mesh = resolve_mesh(cfg)
    if mesh is not None:
        print(f"mesh={dict(mesh.shape)}: AIS chains dp-sharded")
    n_seeds = max(1, int(getattr(args, "seeds", 1)))
    with maybe_profile(args):
        if n_seeds > 1:
            # -seeds N: estimate log p(x) for the N seed-replica
            # checkpoints (checkpoint.pt + .seed{s} from `imputation.py
            # -ensemble true -seeds N`) as ONE vmapped program per split
            from vae_posterior_consistency_tpu.engine import checkpoint
            from vae_posterior_consistency_tpu.models import get_model

            params_ens = checkpoint.load_seed_ensemble(
                cfg, get_model(cfg), dataset.obs_dim, n_seeds)
            results = ais.eval_ais_ensemble(
                dataset, cfg, params_ens, n_sample=cfg.n_ais_iwae, mesh=mesh)
            for stage, res in results.items():
                mu, sd = float(res.logw.mean()), float(res.logw.std())
                per = " ".join(f"s{s}={v:.4f}"
                               for s, v in enumerate(res.logw))
                print(f"  [{stage}] AIS log p(x) = {mu:.4f}±{sd:.4f}  {per}")
            if getattr(args, "bdmc", False):
                print("  [bdmc] skipped: -bdmc certifies one checkpoint's "
                      "schedule; run it without -seeds")
            return
        results = ais.eval_ais(dataset, cfg, n_sample=cfg.n_ais_iwae,
                               mesh=mesh)
        bdmc_res = None
        if getattr(args, "bdmc", False):
            # BDMC sandwich on simulated data: certifies the bridge the
            # real-split estimates above just used (engine/ais.bdmc)
            bdmc_res = ais.eval_bdmc(dataset, cfg, n_sample=cfg.n_ais_iwae,
                                     mesh=mesh)
    for stage, res in results.items():
        print(f"  [{stage}] AIS log p(x) = {res.logw:.4f}")
    if getattr(args, "bdmc", False) and bdmc_res is not None:
        print(f"  [bdmc] sandwich on simulated data: "
              f"lower={bdmc_res.lower:.4f} upper={bdmc_res.upper:.4f} "
              f"gap={bdmc_res.gap:.4f} "
              f"(schedule={cfg.ais_schedule}, T={cfg.n_ais_dist})")


if __name__ == "__main__":
    main()
