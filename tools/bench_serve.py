"""Serving-path latency benchmark: end-to-end ImputationServer.impute.

Measures wall-clock latency (p50/p99) of the compiled, bucketed imputation
path on the attached accelerator — host->device transfer + eval_step + fill +
device->host readback per request — for single-row and batch requests on the
flagship reg_vae model at the wine table shape. The reference has no serving
path at all (research scripts only), so there is no baseline to compare
against; these are absolute numbers for deployment sizing.

Run: python3 tools/bench_serve.py   (prints one JSON line per request shape)

Environment note: on this dev box the TPU sits behind a network tunnel whose
per-request round-trip is ~24ms once any device->host readback has forced the
client synchronous; a serving request needs exactly one dispatch + one
readback (the per-request PRNG fold_in runs inside the compiled program), so
measured p50 ~= 1 RTT regardless of batch size. On a locally-attached chip
the same path is sub-millisecond.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OBS_DIM = 12
N_REQ = 200


def _set_prod_rng():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")  # production default


def main():
    import jax

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.engine.serve import ImputationServer
    from vae_posterior_consistency_tpu.models import get_model

    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", latent_dim=10,
                    alpha=1.0, p_missingness=30)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0), cfg, OBS_DIM)
    server = ImputationServer(params, cfg, OBS_DIM).warmup()

    rng = np.random.default_rng(0)
    dev = jax.devices()[0].device_kind
    for n in (1, 64, 512):
        x = rng.uniform(0, 1, (n, OBS_DIM)).astype(np.float32)
        mask = (rng.random((n, OBS_DIM)) < 0.7).astype(np.float32)
        lat = []
        for _ in range(N_REQ):
            t0 = time.perf_counter()
            server.impute(x, mask)
            lat.append((time.perf_counter() - t0) * 1e3)
        lat = np.sort(lat)
        print(json.dumps({
            "metric": "serve_impute_latency",
            "rows": n,
            "p50_ms": round(float(lat[len(lat) // 2]), 3),
            "p99_ms": round(float(lat[int(len(lat) * 0.99)]), 3),
            "device": dev,
        }))


if __name__ == "__main__":
    _set_prod_rng()
    main()
