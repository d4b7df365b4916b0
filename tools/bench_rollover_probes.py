"""Ensemble-rollover probes: WHY does the seed-ensemble regime lose
throughput past S=256 at batch 64 (RESULTS.md saturation map: S=512 is
-24% vs S=256, S=1024 -39%), and which layout lever recovers it?

VERDICT r4 item 3. Each variant is the seed-mode chunk runner
(parallel/sweep._make_ensemble_chunk) with ONE knob turned:

- engine        the production path (materialized [S, n+pad, D] epoch
                gather, unroll=8) via build_seed_ensemble_runner — the
                baseline the probes are judged against
- perstep       no epoch table: every step gathers its [S, bsz] rows
                straight from the [n, D] source (the hypothesis in
                RESULTS.md blames the materialized epoch gather)
- unroll1/2/4   the engine layout at smaller scan unrolls (the unroll=8
                choice was measured at S=1 on the SERIAL engine; a
                512-replica step is ~512x bigger, so the amortization
                argument no longer applies and the 8x graph may spill)
- perstep_u1    both levers together
- sharedperm    one shared permutation per epoch, replica s reads rows
                perm[(j + s*stride) % n] (index arithmetic, no per-replica
                gather tables). NOT stream-equivalent to the engine (the
                shuffles of different replicas become rotations of one
                draw) — a probe of the perm/gather cost ceiling, not a
                drop-in.

Usage (serialize with other TPU work):
    PYTHONPATH=.:/root/.axon_site python3 tools/bench_rollover_probes.py \
        [-seeds 256,512] [-batch 64] [-epochs 10] [-variants engine,perstep,...]

Prints one JSON line per (variant, S); appends to
tools/rollover_probes_out.jsonl.
"""

import json
import math
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np
import optax

from bench import N_ROWS, OBS_DIM, _train_flops_per_sample
from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.data.loaders import Dataset, Split
from vae_posterior_consistency_tpu.engine.train import LEARNING_RATE
from vae_posterior_consistency_tpu.models import get_model
from vae_posterior_consistency_tpu.ops import masks as masks_ops
from vae_posterior_consistency_tpu.parallel.sweep import (
    _stacked_init,
    build_seed_ensemble_runner,
)


def _make_probe_chunk(cfg, model, data, mask, seeds, *, gather: str,
                      unroll: int):
    """Seed-mode chunk runner with (gather, unroll) knobs. `gather`:
    'epoch' = materialized [S, n+pad, D] tables (engine layout),
    'step' = per-step jnp.take from the [n, D] source,
    'shared' = one perm + per-replica rotation indices (see module doc)."""
    info = cfg.info
    tx = optax.adam(LEARNING_RATE)
    n = data.shape[0]
    S = len(seeds)
    seeds_v = jnp.asarray(seeds, jnp.uint32)
    bsz = min(cfg.batch_size, n)
    steps = math.ceil(n / bsz)
    pad = steps * bsz - n

    def loss_fn(p, x, m, mp, key, epoch):
        return model.train_loss(p, x, m, mp, key, epoch, cfg)[0]

    def total_loss(Pens, x_b, m_b, mp_b, k_models, epoch):
        per = jax.vmap(loss_fn, (0, 0, 0, 0, 0, None))(Pens, x_b, m_b, mp_b,
                                                       k_models, epoch)
        return jnp.sum(per), per

    grad_fn = jax.value_and_grad(total_loss, has_aux=True)

    @partial(jax.jit, static_argnames=("n_epochs",), donate_argnums=(0, 1))
    def run_chunk(Pens, opt_state, epoch0, n_epochs):
        def epoch_body(carry, off):
            Pens, opt_state = carry
            epoch = (epoch0 + off).astype(jnp.float32) + 1.0
            ekeys = jax.vmap(
                lambda s: jax.random.fold_in(jax.random.PRNGKey(s),
                                             epoch0 + off))(seeds_v)
            kperms, ksteps = jax.vmap(jax.random.split, out_axes=1)(ekeys)

            def padded(perm):
                return jnp.concatenate([perm, perm[:pad]]) if pad else perm

            if gather == "shared":
                perm = padded(jax.random.permutation(kperms[0], n))
                # replica s starts its pass s*stride rows into the shared
                # order; index arithmetic only, no [S, n+pad] tables
                stride = max(1, n // max(S, 1))
                offs = (jnp.arange(S, dtype=jnp.uint32) * stride) % n
            else:
                perms = jax.vmap(
                    lambda k: padded(jax.random.permutation(k, n)))(kperms)
            if gather == "epoch":
                x_epoch = jnp.take(data, perms, axis=0)  # [S, n+pad, D]
                m_epoch = jnp.take(mask, perms, axis=0)
            step_keys = jax.vmap(jax.vmap(
                lambda k, s: jax.random.split(jax.random.fold_in(k, s)),
                (None, 0)), (0, None))(ksteps, jnp.arange(steps))
            step_keys = jnp.swapaxes(step_keys, 0, 1)  # [steps, S, 2, 2]

            def step_body(carry2, inputs):
                Pens, opt_state = carry2
                s, kp = inputs
                if gather == "epoch":
                    x_b = jax.lax.dynamic_slice(
                        x_epoch, (0, s * bsz, 0), (S, bsz, OBS_DIM))
                    m_b = jax.lax.dynamic_slice(
                        m_epoch, (0, s * bsz, 0), (S, bsz, OBS_DIM))
                elif gather == "step":
                    idx = jax.lax.dynamic_slice(perms, (0, s * bsz),
                                                (S, bsz))
                    x_b = jnp.take(data, idx, axis=0)  # [S, bsz, D]
                    m_b = jnp.take(mask, idx, axis=0)
                else:  # shared
                    base = jax.lax.dynamic_slice(perm, (s * bsz,), (bsz,))
                    idx = (base[None, :] + offs[:, None]) % n  # [S, bsz]
                    x_b = jnp.take(data, idx, axis=0)
                    m_b = jnp.take(mask, idx, axis=0)
                k_mask, k_model = kp[:, 0], kp[:, 1]
                eff_m, mask_p = jax.vmap(
                    lambda k, m: masks_ops.train_masks(info, cfg, k, m)
                )(k_mask, m_b)
                (tot, per), grads = grad_fn(Pens, x_b, eff_m, mask_p,
                                            k_model, epoch)
                updates, opt_state = tx.update(grads, opt_state, Pens)
                Pens = optax.apply_updates(Pens, updates)
                return (Pens, opt_state), per

            (Pens, opt_state), losses = jax.lax.scan(
                step_body, (Pens, opt_state),
                (jnp.arange(steps), step_keys), unroll=min(unroll, steps))
            return (Pens, opt_state), jnp.sum(losses, axis=0)

        (Pens, opt_state), hist = jax.lax.scan(epoch_body, (Pens, opt_state),
                                               jnp.arange(n_epochs))
        return Pens, opt_state, hist

    return run_chunk, tx


VARIANTS = {
    "engine": dict(),
    "perstep": dict(gather="step", unroll=8),
    "unroll1": dict(gather="epoch", unroll=1),
    "unroll2": dict(gather="epoch", unroll=2),
    "unroll4": dict(gather="epoch", unroll=4),
    "perstep_u1": dict(gather="step", unroll=1),
    "perstep_u2": dict(gather="step", unroll=2),
    "sharedperm": dict(gather="shared", unroll=8),
}


def measure(variant: str, n_seeds: int, batch: int, epochs: int,
            profile_dir: str = ""):
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", batch_size=batch,
                    latent_dim=10, alpha=1.0, p_missingness=30, epoch=epochs)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.uniform(0, 1, (N_ROWS, OBS_DIM)), jnp.float32)
    mask = jnp.asarray(rng.random((N_ROWS, OBS_DIM)) < 0.7, jnp.float32)
    ds = Dataset(train=Split(data, mask, "train"), test=None, obs_dim=OBS_DIM)

    if variant == "engine":
        run_chunk, params, opt_state = build_seed_ensemble_runner(
            ds, cfg, list(range(n_seeds)))
    else:
        model = get_model(cfg)
        kn = VARIANTS[variant]
        run_chunk, tx = _make_probe_chunk(cfg, model, data, mask,
                                          list(range(n_seeds)), **kn)
        init_keys = jax.vmap(jax.random.PRNGKey)(
            jnp.arange(n_seeds, dtype=jnp.uint32))
        params = _stacked_init(model, cfg, OBS_DIM, init_keys)
        opt_state = tx.init(params)

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
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
        params, opt_state, hist = run_chunk(params, opt_state,
                                            jnp.asarray(done), epochs)
        float(hist[-1, 0])
        jax.profiler.stop_trace()
    return n_seeds * epochs * N_ROWS / best, t_compile, float(hist[-1, 0])


def _arg(flag, default):
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


def main():
    seeds = [int(s) for s in _arg("-seeds", "256,512").split(",")]
    batch = int(_arg("-batch", "64"))
    epochs = int(_arg("-epochs", "10"))
    variants = _arg("-variants", "engine,perstep,unroll2,perstep_u1").split(",")
    profile = _arg("-profile", "")
    fps = _train_flops_per_sample()
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "rollover_probes_out.jsonl")
    print(f"device={jax.devices()[0].device_kind} rows={N_ROWS} "
          f"epochs/point={epochs}", flush=True)
    for S in seeds:
        for v in variants:
            pdir = (os.path.join(profile, f"{v}_S{S}") if profile else "")
            sps, t_c, loss = measure(v, S, batch, epochs, profile_dir=pdir)
            rec = {"variant": v, "n_seeds": S, "batch": batch,
                   "samples_per_sec": round(sps, 1),
                   "tflops": round(sps * fps / 1e12, 3),
                   "compile_s": round(t_c, 1), "final_loss0": round(loss, 4)}
            print(json.dumps(rec), flush=True)
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
