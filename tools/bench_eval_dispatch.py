"""Measure the eval-dispatch batching win (round-2 VERDICT item 5).

The MCAR evaluation engine folds the reference's M-rep Monte-Carlo loop
(src/experiment_main/evaluate.py:160-245, M=50 in most grid configs) into ONE
compiled program per split (engine/evaluate.py:_split_eval_fn). Through a
tunneled single-tenant TPU every dispatch costs a full host->device RTT
(~27 ms on this box), so the former loop paid ~M RTTs per split.

This tool times, on the flagship config (reg_vae1 + kl_reg, wine-shaped
N=4898 x 12, batch 64, M=50):

  batched : the production path — all_reps(params, x, mask, keys[50]) once
  looped  : the SAME compiled program driven with one key per dispatch, 50
            sequential dispatches (exactly the pre-round-2 structure)

Prints one JSON line with both latencies and the speedup. Medians of 3.
"""

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from vae_posterior_consistency_tpu.config import RunConfig, apply_rng_impl
from vae_posterior_consistency_tpu.engine.evaluate import _split_eval_fn
from vae_posterior_consistency_tpu.models import get_model

N_ROWS, OBS_DIM, M = 4898, 12, 50


def _median_time(fn, reps=4):
    """Median of `reps` steady-state timings over DISTINCT inputs, discarding
    one extra leading call. Each rep gets its own key set: repeating identical
    (function, args) through the axon tunnel reads ~0.1 ms for a multi-ms
    program (client-side dedup), so same-args timing measures nothing."""
    ts = []
    for r in range(reps + 1):
        t0 = time.perf_counter()
        out = fn(r)
        _readback(out)  # block_until_ready alone can return early (axon)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts[1:])


def _readback(out):
    """Force completion with a real device->host read (sums one scalar per
    result dict; through the tunnel block_until_ready is not a reliable
    barrier — CLAUDE.md 'axon timing quirks')."""
    if isinstance(out, list):
        for o in out:
            _readback(o)
    else:
        float(out["rmse"])


def main():
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", batch_size=64,
                    latent_dim=10, alpha=1.0, p_missingness=30, M=M)
    apply_rng_impl(cfg)
    model = get_model(cfg)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (N_ROWS, OBS_DIM)), jnp.float32)
    mask = jnp.asarray(rng.random((N_ROWS, OBS_DIM)) < 0.7, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), cfg, OBS_DIM)

    eval_fn = _split_eval_fn(cfg, model, N_ROWS, num_samples=None)
    key = jax.random.PRNGKey(7)

    def key_set(r):
        kr = jax.random.fold_in(key, r)
        return jax.vmap(lambda m: jax.random.fold_in(kr, m))(jnp.arange(M))

    # one-key variant: same engine, driven per-rep (the pre-batching design);
    # a distinct compiled program (keys shape [1]) — warm both before timing,
    # syncing via readback (compiles can outlive block_until_ready here)
    _readback(eval_fn(params, x, mask, key_set(1000)))
    _readback(eval_fn(params, x, mask, key_set(1001)[:1]))

    t_batched = _median_time(lambda r: eval_fn(params, x, mask, key_set(r)))

    def looped(r):
        # sequential per-rep dispatches: each must complete before timing ends
        # (returning only the last would let the other M-1 stay in flight)
        ks = key_set(100 + r)
        return [eval_fn(params, x, mask, ks[m:m + 1]) for m in range(M)]

    t_looped = _median_time(looped)

    print(json.dumps({
        "metric": "eval_split_latency_M50",
        "batched_ms": round(t_batched * 1e3, 1),
        "looped_ms": round(t_looped * 1e3, 1),
        "speedup": round(t_looped / t_batched, 1),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
