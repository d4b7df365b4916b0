"""Measure the Pallas fused-posterior kernel against XLA's jnp fusion across
block sizes, including the ensemble regime (VERDICT r1 item 6).

For each [rows, L=10] shape this times one value_and_grad step of a
loss-shaped closure over the fused tail (z sampling + 3 KLs + a reduction
consuming z, so the custom VJP runs too) for both implementations:
  - pallas: ops/fused_posterior.fused_posterior (kernel + closed-form VJP)
  - xla:    ops/fused_posterior.fused_posterior_reference (one XLA fusion)

Prints one JSON line per shape plus a crossover summary. Run on the TPU
(serialize with other TPU work — single-tenant tunnel).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from vae_posterior_consistency_tpu.ops.fused_posterior import (
    PALLAS_MIN_ELEMS,
    fused_posterior,
    fused_posterior_reference,
)

L = 10
SHAPES = [64, 1024, 6554, 8192, 65536, 262144]  # rows; 6554*10 ~ MIN_ELEMS
REPS = 3
#: grad steps per dispatch: a single dispatch through the tunneled TPU costs
#: a ~27 ms RTT that swamps any kernel, so the step runs ITERS times inside
#: one compiled scan (grads fed back so nothing dead-code-eliminates) and
#: per-step time is dispatch_time / ITERS
ITERS = 200


def _timed(fn, args):
    """Per-rep the FIRST stat gets a value-negligible rep-indexed offset:
    byte-identical re-dispatches of the same program read ~0.1 ms through
    the tunnel (client-side dedup, CLAUDE.md axon quirks) — without the
    variation the pallas/xla numbers are fiction. Both paths get the same
    treatment, so the comparison stays fair."""
    out = fn(jnp.float32(0.0), *args)
    float(out)  # readback barrier (block_until_ready can return early here)
    best = None
    for r in range(REPS):
        t0 = time.perf_counter()
        out = fn(jnp.float32((r + 1) * 1e-30), *args)
        float(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / ITERS


def main():
    key = jax.random.PRNGKey(0)
    results = []
    for rows in SHAPES:
        ks = jax.random.split(key, 6)
        stats = [jax.random.normal(k, (rows, L)) * 0.3 for k in ks[:4]]
        eps = [jax.random.normal(k, (rows, L)) for k in ks[4:]]

        def make(fused_fn):
            def loss(mq, lq, mp, lp):
                zq, zp, klq, klp, klr = fused_fn(mq, lq, mp, lp, *eps)
                return jnp.sum(zq * zq) + jnp.sum(zp) + klq + klp + klr

            g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))

            @jax.jit
            def many(rep_jitter, mq, lq, mp, lp):
                def body(carry, _):
                    mq, lq, mp, lp = carry
                    v, (gmq, glq, gmp, glp) = g(mq, lq, mp, lp)
                    return (mq + 1e-6 * gmq, lq + 1e-6 * glq,
                            mp + 1e-6 * gmp, lp + 1e-6 * glp), v
                carry, vs = jax.lax.scan(body, (mq + rep_jitter, lq, mp, lp),
                                         None, length=ITERS)
                return vs[-1]

            return many

        t_pallas = _timed(make(fused_posterior), stats)
        t_xla = _timed(make(fused_posterior_reference), stats)
        rec = {
            "rows": rows,
            "elems": rows * L,
            "pallas_us": round(t_pallas * 1e6, 1),
            "xla_us": round(t_xla * 1e6, 1),
            "pallas_speedup": round(t_xla / t_pallas, 3),
            "above_min_elems": rows * L >= PALLAS_MIN_ELEMS,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    wins = [r for r in results if r["pallas_speedup"] > 1.0]
    print(json.dumps({
        "summary": "pallas_wins_at_rows",
        "rows": [r["rows"] for r in wins],
        "current_min_elems": PALLAS_MIN_ELEMS,
    }))


if __name__ == "__main__":
    main()
