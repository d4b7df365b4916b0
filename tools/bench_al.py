"""Active-learning selection-step latency benchmark (BASELINE.json metric:
"AL selection step p50").

One selection step = M-sample imputation + information reward for every hidden
candidate feature over all test rows + argmax reveal + predictive-MSE
re-measure (reference loop: src/experiment_main/evaluate.py:387-459, a Python
nest of single-row encoder calls; here one compiled program per step).

Measures p50/p90 per-step wall time on wine-shaped AL (D=12, the reference's
n_test~490 rows at 10% of 4898, M=50 as in the MCAR config defaults).

Usage:  python3 tools/bench_al.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")  # production default

import jax.numpy as jnp
import numpy as np

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.engine.active_learning import make_al_runner
from vae_posterior_consistency_tpu.models import get_model


def main(n_test=490, obs_dim=12, M=50):
    cfg = RunConfig(vae_type="vanilla_vae1", M=M, latent_dim=10)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0), cfg, obs_dim)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n_test, obs_dim))
    mask_p = jnp.ones((n_test, obs_dim))

    runner = make_al_runner(cfg, model, obs_dim, n_test)
    # the runner compiles the whole (D-1)-step episode; per-step latency is
    # episode time / steps at steady state
    out = runner(params, x, mask_p, jax.random.PRNGKey(2))  # compile
    # readback barrier: through the tunnel, block_until_ready can return
    # early while the compile is in flight (CLAUDE.md axon quirks)
    float(out["information_curve"][0, 0])

    times = []
    for i in range(5):
        t0 = time.perf_counter()
        out = runner(params, x, mask_p, jax.random.PRNGKey(3 + i))
        float(out["information_curve"][0, 0])
        times.append((time.perf_counter() - t0) / (obs_dim - 1))
    times = np.asarray(times) * 1e3  # ms per selection step
    print(json.dumps({
        "metric": "al_selection_step_latency",
        "p50_ms": round(float(np.percentile(times, 50)), 2),
        "p90_ms": round(float(np.percentile(times, 90)), 2),
        "n_test": n_test, "obs_dim": obs_dim, "M": M,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
