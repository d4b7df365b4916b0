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
import numpy as np

from vae_posterior_consistency_tpu.config import (
    RunConfig,
    apply_rng_impl,
    iter_jsonl_configs,
    setup_parser,
)
from vae_posterior_consistency_tpu.data.default_configs import write_default_configs
from vae_posterior_consistency_tpu.engine import active_learning as al_engine

MISSING_SWEEP = [30]
ALPHA_SWEEP = [1.0]


def _torch_load(path):
    import torch

    return np.asarray(torch.load(path, map_location="cpu", weights_only=False))


def main():
    print("Devices:", jax.devices())
    write_default_configs("Data")
    for record in iter_jsonl_configs("Data/imputation_args.json"):
        for missing in MISSING_SWEEP:
            for alpha in ALPHA_SWEEP:
                args = setup_parser(record, "impute_eval").parse_args()
                cfg = RunConfig.from_args(args, alpha=alpha, p_missingness=missing)
                apply_rng_impl(cfg)
                index = cfg.info.split_index or "1"
                base = os.path.join(cfg.data_path, cfg.data_type)
                data = _torch_load(os.path.join(base, "data.pt")).astype(np.float32)
                mask = _torch_load(
                    os.path.join(base,
                                 f"mask_{cfg.missing_rate}_missing{index}.pt")
                ).astype(np.float32)
                test_idx = np.loadtxt(
                    os.path.join(base, f"test_index{index}.csv"), delimiter=","
                ).astype(np.int64).reshape(-1)
                # min-max normalize (reference: active_learning.py:49-53)
                data = (data - data.min(axis=0)) / (
                    data.max(axis=0) - data.min(axis=0)
                )
                print(f"=== active learning {cfg.vae_type} ===")
                out = al_engine.active_learning_func(
                    None, data[test_idx], mask[test_idx], cfg, Repeat=1
                )
                curve = np.asarray(out["information_curve"])[0, 0, :]
                print("  info curve (target MSE per #revealed): "
                      + " ".join(f"{v:.4f}" for v in curve))


if __name__ == "__main__":
    main()
