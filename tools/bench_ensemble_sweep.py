"""Ensemble-regime saturation sweep: samples/s vs (replica count, batch).

VERDICT r3 item 8: the production sweep regime (parallel/sweep.py seed
ensembles of the flagship config) was mapped only to S=128 at the
reference batch 64. This tool sweeps replica count PAST the plateau and
crosses it with batch size — the two knobs a production sweep can turn —
recording where samples/s/chip rolls over, so bench.py's
`ensemble_n_seeds` default sits at the measured knee.

Usage (serialize with other TPU work):
    PYTHONPATH=.:/root/.axon_site python3 tools/bench_ensemble_sweep.py \
        [-seeds 64,128,256,512] [-batches 64,256,1024] [-epochs 10]

Prints one JSON line per point; appends to tools/ensemble_sweep_out.jsonl.
Protocol: bench.py's (compile+warm with a readback, vary the epoch counter
between reps, best of 3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np

from bench import N_ROWS, OBS_DIM, _peak_tflops, _train_flops_per_sample
from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.data.loaders import Dataset, Split
from vae_posterior_consistency_tpu.parallel.sweep import (
    build_seed_ensemble_runner,
)


def measure(n_seeds: int, batch: int, epochs: int):
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", batch_size=batch,
                    latent_dim=10, alpha=1.0, p_missingness=30, epoch=epochs)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.uniform(0, 1, (N_ROWS, OBS_DIM)), jnp.float32)
    mask = jnp.asarray(rng.random((N_ROWS, OBS_DIM)) < 0.7, jnp.float32)
    ds = Dataset(train=Split(data, mask, "train"), test=None, obs_dim=OBS_DIM)

    run_chunk, params, opt_state = build_seed_ensemble_runner(
        ds, cfg, list(range(n_seeds)))
    t0 = time.perf_counter()
    params, opt_state, hist = run_chunk(params, opt_state, jnp.asarray(0),
                                        epochs)
    float(hist[-1, 0])  # readback barrier (axon quirk)
    t_compile = time.perf_counter() - t0
    best, done = None, epochs
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt_state, hist = run_chunk(params, opt_state,
                                            jnp.asarray(done), epochs)
        float(hist[-1, 0])
        dt = time.perf_counter() - t0
        done += epochs
        best = dt if best is None else min(best, dt)
    return n_seeds * epochs * N_ROWS / best, t_compile


def _arg(flag, default):
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


def main():
    seeds = [int(s) for s in _arg("-seeds", "64,128,256,512").split(",")]
    batches = [int(b) for b in _arg("-batches", "64,256,1024").split(",")]
    epochs = int(_arg("-epochs", "10"))
    fps = _train_flops_per_sample()
    peak = _peak_tflops() or float("nan")
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "ensemble_sweep_out.jsonl")
    print(f"device={jax.devices()[0].device_kind} rows={N_ROWS} "
          f"epochs/point={epochs} flops/sample={fps/1e6:.3f}M", flush=True)
    for batch in batches:
        for S in seeds:
            sps, t_c = measure(S, batch, epochs)
            tf = sps * fps / 1e12
            rec = {"n_seeds": S, "batch": batch,
                   "samples_per_sec": round(sps, 1),
                   "tflops": round(tf, 3), "mfu": round(tf / peak, 5),
                   "compile_s": round(t_c, 1)}
            print(json.dumps(rec), flush=True)
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
