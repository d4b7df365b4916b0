"""Serving-path latency/throughput benchmark (engine/serve.ImputationServer).

Measures per-request wall latency (p50/p95) and amortized rows/s of the
compiled, bucketed imputation path for the flagship table model and the
784-dim MNIST-EDDI model, per batch bucket.

Caveat printed with the results: through the tunneled single-tenant TPU every
request pays a host<->device round trip whose latency is a property of THIS
tunnel, not the chip — small-bucket p50 is RTT-bound; the large buckets show
the serving-throughput ceiling.

Run: PYTHONPATH=.:/root/.axon_site python3 tools/bench_serve.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")

import numpy as np

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.engine.serve import ImputationServer
from vae_posterior_consistency_tpu.models import get_model

REPS = 30


def bench_model(tag, cfg, obs_dim):
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0), cfg, obs_dim)
    server = ImputationServer(params, cfg, obs_dim)
    server.warmup()
    rng = np.random.default_rng(0)
    print(f"--- {tag} (obs_dim={obs_dim}) ---")
    print(f"{'bucket':>7} {'p50_ms':>8} {'p95_ms':>8} {'rows/s':>10}")
    for b in server.buckets:
        x = rng.uniform(0, 1, (b, obs_dim)).astype(np.float32)
        m = (rng.random((b, obs_dim)) < 0.7).astype(np.float32)
        lat = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            filled, _score = server.impute(x, m)  # device_get inside = sync
            lat.append(time.perf_counter() - t0)
        lat = np.sort(np.array(lat))
        p50 = lat[len(lat) // 2] * 1e3
        # nearest-rank p95: ceil(0.95*n)-th smallest (int(n*0.95)-1 would be
        # the ~93rd percentile at n=30)
        p95 = lat[int(np.ceil(len(lat) * 0.95)) - 1] * 1e3
        print(f"{b:>7} {p50:>8.1f} {p95:>8.1f} {b / (p50 / 1e3):>10.0f}",
              flush=True)


def main():
    print(f"device={jax.devices()[0].device_kind}  reps={REPS}  "
          "(per-request latency includes the tunnel RTT — see module doc)")
    bench_model(
        "flagship reg_vae (wine-shaped)",
        RunConfig(vae_type="reg_vae1", reg_type="kl_reg", latent_dim=10,
                  alpha=1.0, p_missingness=30),
        12,
    )
    bench_model(
        "MNIST-EDDI reg",
        RunConfig(vae_type="reg_EDDI_mnist1", data_type="mnist",
                  reg_type="kl_reg", latent_dim=10, K=10, alpha=1.0,
                  p_missingness=30),
        784,
    )


if __name__ == "__main__":
    main()
