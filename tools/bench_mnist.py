"""MNIST-EDDI regime study: batch/dtype throughput sweep + profiler trace.

The reference's only matmul-heavy family is the 784-dim MNIST EDDI VAE
(reference: src/models/VAE.py:32-44 — pointnet encoder with 500/500/200 trunk,
200/500/500 decoder). This tool measures its compiled training throughput on
the attached accelerator across batch sizes and matmul dtypes
(RunConfig.compute_dtype), reports analytic-matmul TFLOP/s + MFU for each
point, and optionally records a jax.profiler trace of the steady-state loop.

Run (serialize with other TPU work — the chip is single-tenant):
    PYTHONPATH=.:/root/.axon_site python3 tools/bench_mnist.py
    PYTHONPATH=.:/root/.axon_site python3 tools/bench_mnist.py -profile trace_dir

Measurement protocol (CLAUDE.md axon quirks): warm up with a real readback,
vary the epoch counter between reps so the client can't dedup, best of 3.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp

from bench import (
    MNIST_DIM,
    MNIST_ROWS,
    _bench_mnist,
    _mnist_flops_per_sample,
    _mnist_setup,
    _peak_tflops,
)


def measure(batch: int, dtype: str, epochs: int = 30):
    """One sweep point: (samples/s, compile_seconds, final_loss) — the
    warmup + timing body lives in bench._bench_mnist (one definition)."""
    return _bench_mnist(batch, dtype, epochs)


def main():
    profile_dir = None
    if "-profile" in sys.argv:
        profile_dir = sys.argv[sys.argv.index("-profile") + 1]
    batches = (64, 256, 512, 1024)
    if "-batches" in sys.argv:
        batches = tuple(
            int(b) for b in
            sys.argv[sys.argv.index("-batches") + 1].split(","))

    fps = _mnist_flops_per_sample()
    peak = _peak_tflops() or float("nan")
    print(f"device={jax.devices()[0].device_kind}  "
          f"matmul_flops/sample={fps/1e6:.2f}M  peak={peak} TFLOP/s")
    print(f"{'batch':>6} {'dtype':>9} {'samples/s':>12} {'TFLOP/s':>9} "
          f"{'MFU%':>7} {'compile_s':>10}")
    results = []
    for batch in batches:
        for dtype in ("float32", "bfloat16"):
            sps, t_c, loss = measure(batch, dtype)
            tf = sps * fps / 1e12
            results.append((batch, dtype, sps, tf, 100 * tf / peak))
            print(f"{batch:>6} {dtype:>9} {sps:>12.0f} {tf:>9.2f} "
                  f"{100*tf/peak:>7.3f} {t_c:>10.1f}   (final loss {loss:.1f})",
                  flush=True)

    if profile_dir:
        # trace the steady-state best configuration
        batch, dtype = max(results, key=lambda r: r[3])[:2]
        print(f"tracing batch={batch} dtype={dtype} -> {profile_dir}")
        runner, params, opt_state = _mnist_setup(batch, dtype)
        key = jax.random.PRNGKey(1)
        params, opt_state, losses = runner(params, opt_state, key,
                                           jnp.asarray(0), 30)
        float(losses[-1])
        jax.profiler.start_trace(profile_dir)
        params, opt_state, losses = runner(params, opt_state, key,
                                           jnp.asarray(30), 30)
        float(losses[-1])
        jax.profiler.stop_trace()
        print("trace written")


if __name__ == "__main__":
    main()
