"""AIS marginal-likelihood evaluation entry point.

The reference ships its AIS+HMC estimator as a library imported by every entry
script but wired into none of them (reference: src/experiment_main/
imputation.py:11 imports eval_ais; src/utils/AIS.py:80-91). This entry point
makes it a first-class pipeline: evaluate log p(x) for a trained
Gaussian-decoder checkpoint over the train/test splits.

Run:  PYTHONPATH=. python3 experiment_main/ais_eval.py -vae_type vanilla_vae1 ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the reference runs with torch.autograd.set_detect_anomaly(True) always on
# (src/experiment_main/imputation.py:19 and siblings) at heavy runtime cost;
# the TPU equivalent (jax_debug_nans re-runs the faulting op un-jitted) is
# opt-in here to keep the compiled hot loop intact: VPC_DEBUG_NANS=1
if os.environ.get("VPC_DEBUG_NANS"):
    from vae_posterior_consistency_tpu.utils.debugging import (
        enable_nan_debugging,
    )

    enable_nan_debugging()

from vae_posterior_consistency_tpu.config import (
    RunConfig,
    apply_rng_impl,
    iter_jsonl_configs,
    setup_parser,
)
from vae_posterior_consistency_tpu.data import loaders
from vae_posterior_consistency_tpu.data.default_configs import write_default_configs
from vae_posterior_consistency_tpu.engine import ais


def main():
    print("Devices:", jax.devices())
    write_default_configs("Data")
    record = next(iter_jsonl_configs("Data/imputation_args.json"))
    args = setup_parser(record, "ais_eval").parse_args()
    cfg = RunConfig.from_args(args)
    apply_rng_impl(cfg)
    if "MIWAE" in cfg.vae_type or "flow" in cfg.vae_type:
        raise SystemExit(
            "AIS needs a Gaussian-decoder family (vae/EDDI); got "
            f"{cfg.vae_type!r}"
        )
    dataset = loaders.data_loader(
        cfg.data_path, cfg.vae_type, cfg.missing_rate, cfg.batch_size,
        cfg.data_type,
    )
    schedule = (
        ais.linear_schedule(cfg.n_ais_dist)
        if cfg.ais_schedule == "linear"
        else ais.sigmoidial_schedule(cfg.n_ais_dist)
    )
    results = ais.eval_ais(dataset, cfg, schedule=schedule,
                           n_sample=cfg.n_ais_iwae)
    for stage, res in results.items():
        print(f"  [{stage}] AIS log p(x) = {res.logw:.4f}")


if __name__ == "__main__":
    main()
