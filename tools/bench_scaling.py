"""Scaling benchmark: throughput vs batch size and vs IWAE sample count.

The flagship bench (bench.py) pins the reference's exact run shape (batch 64 —
latency-bound on a v5e). This tool maps the chip's headroom for production
shapes: one optimizer step per timing unit, steady-state (program compiled
before timing), batch sizes from the reference's 64 up to MXU-saturating sizes,
and MIWAE importance-sample counts up to the reference's valid_k=5000.

Usage:  PYTHONPATH=. python3 tools/bench_scaling.py
Prints a JSON lines table.
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
import optax

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.models import get_model
from vae_posterior_consistency_tpu.ops import masks

OBS_DIM = 12


def steady_state_step_rate(cfg, batch, n_timed=2000, key=0):
    """Samples/sec of a compiled scan of `n_timed` optimizer steps."""
    model = get_model(cfg)
    rng = np.random.default_rng(key)
    x = jnp.asarray(rng.uniform(0, 1, (batch, OBS_DIM)), jnp.float32)
    m = jnp.asarray(rng.random((batch, OBS_DIM)) < 0.7, jnp.float32)
    params = model.init(jax.random.PRNGKey(key), cfg, OBS_DIM)
    tx = optax.adam(1e-3)

    # pytree params end-to-end — the engine's production layout since the
    # round-4 re-measurement (engine/train.py; the flat-vector scaffold this
    # tool carried would misattribute unravel/concat cost to batch scaling)
    def loss_fn(p, k):
        mp = masks.sub_mask(k, m, cfg.p_missingness)
        return model.train_loss(p, x, m, mp, k, jnp.float32(1.0), cfg)[0]

    @jax.jit
    def run(p, opt, key0):
        def step(c, i):
            p, opt = c
            l, g = jax.value_and_grad(loss_fn)(p, jax.random.fold_in(key0, i))
            u, opt = tx.update(g, opt, p)
            return (optax.apply_updates(p, u), opt), l

        (p, opt), ls = jax.lax.scan(step, (p, opt), jnp.arange(n_timed),
                                    unroll=4)
        return p, opt, ls[-1]

    p, opt = params, tx.init(params)
    p, opt, last = run(p, opt, jax.random.PRNGKey(1))  # compile + warmup
    float(last)  # readback barrier (block_until_ready can return early here)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        p, opt, last = run(p, opt, jax.random.PRNGKey(2))
        float(last)
        best = min(best, time.perf_counter() - t0)
    return n_timed * batch / best


def miwae_eval_rate(batch, k, reps=3, inner=100):
    """Device rows/sec of the jitted MIWAE eval_step (K importance samples):
    `inner` eval steps with distinct keys run inside ONE program (lax.map),
    so the per-dispatch RTT (~28 ms through the tunnel, dominated by the
    result readback) is amortized away and the number is device throughput.

    Measurement hygiene (axon tunnel): fresh PRNG key per timing rep —
    identical-args reruns are deduped client-side and read ~0.1 ms; and the
    warmup ends with a real readback, because block_until_ready can return
    early while the compile is still in flight (CLAUDE.md "axon quirks")."""
    cfg = RunConfig(vae_type="vanilla_MIWAE1", valid_k=k)
    model = get_model(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, OBS_DIM)), jnp.float32)
    m = jnp.asarray(rng.random((batch, OBS_DIM)) < 0.7, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), cfg, OBS_DIM)

    @jax.jit
    def ev(params, key):
        def one(k_i):
            out = model.eval_step(params, x, m, m, k_i, cfg, num_samples=k)
            return out["x_imputed"].sum() + out["row_loss"].sum()
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(inner))
        return jnp.sum(jax.lax.map(one, keys))

    float(ev(params, jax.random.PRNGKey(99)))  # compile; readback = sync
    best = 1e9
    for r in range(reps):
        t0 = time.perf_counter()
        s = ev(params, jax.random.PRNGKey(r))
        float(s)
        best = min(best, time.perf_counter() - t0)
    return inner * batch / best


def main():
    device = str(jax.devices()[0])

    def record(label, cfg, batch, k, n_timed):
        try:
            sps = steady_state_step_rate(cfg, batch, n_timed=n_timed)
        except Exception as e:  # the remote-compile service can 500 on big
            print(json.dumps({"model": label, "batch": batch,
                              "iw_samples": k, "error": str(e)[:120]}),
                  flush=True)
            return
        print(json.dumps({
            "model": label, "batch": batch, "iw_samples": k,
            "samples_per_sec": round(sps), "device": device,
        }), flush=True)

    # batch scaling, flagship reg_vae
    for batch in (64, 256, 1024, 4096):
        record("reg_vae_klreg", RunConfig(vae_type="reg_vae1"), batch, 1,
               max(200, 200000 // batch))
    # IWAE sample scaling, MIWAE at the reference's train/valid sample counts
    for k in (20, 200, 1000, 5000):
        record("miwae_iwae", RunConfig(vae_type="vanilla_MIWAE1", train_k=k),
               64, k, max(50, 20000 // k))
    # MIWAE evaluation throughput at the reference's valid_k
    for batch in (64, 512):
        try:
            rps = miwae_eval_rate(batch, 5000)
            print(json.dumps({"model": "miwae_eval", "batch": batch,
                              "iw_samples": 5000,
                              "rows_per_sec": round(rps),
                              "device": device}), flush=True)
        except Exception as e:
            print(json.dumps({"model": "miwae_eval", "batch": batch,
                              "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
