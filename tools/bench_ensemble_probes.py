"""Seed-ensemble layout probes: ensemble engine vs inline stacked-pytree.

Round-4 measurement record: the ENSEMBLE engine (parallel/sweep.py) used an
[S, P] flat matrix with per-replica `unravel` inside the vmapped loss and
one fused Adam over the matrix — the same unravel/concat pattern the
single-run engine retired (tools/bench_mnist_probes.py). Measured
head-to-head at the production shape (S=128, batch 64, wine-shaped
flagship), the stacked-pytree design (leaves carry a leading [S] axis,
optax Adam per leaf) won +21% — 40.8M vs 33.8M samples/s, identical
losses — and parallel/sweep.py was migrated to it. The `engine` variant
now exercises the shipping (stacked-pytree) engine; `pytree` is the
inline reimplementation both designs were judged with.

Usage (serialize with other TPU work):
    PYTHONPATH=.:/root/.axon_site python3 tools/bench_ensemble_probes.py \
        [-seeds 128] [-batch 64] [-epochs 20] [-only engine,pytree]
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

from bench import N_ROWS, OBS_DIM, _peak_tflops, _train_flops_per_sample
from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.data.loaders import Dataset, Split
from vae_posterior_consistency_tpu.engine.train import LEARNING_RATE
from vae_posterior_consistency_tpu.models import get_model
from vae_posterior_consistency_tpu.ops import masks as masks_ops


def _setup(batch):
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", batch_size=batch,
                    latent_dim=10, alpha=1.0, p_missingness=30)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.uniform(0, 1, (N_ROWS, OBS_DIM)), jnp.float32)
    mask = jnp.asarray(rng.random((N_ROWS, OBS_DIM)) < 0.7, jnp.float32)
    return cfg, data, mask


def make_engine(cfg, data, mask, seeds):
    """The shipping engine (parallel/sweep.build_seed_ensemble_runner).
    Since the round-4 migration this IS a stacked-pytree ensemble; the
    variant remains as the regression baseline against `pytree` (the
    inline reimplementation both designs were judged with)."""
    from vae_posterior_consistency_tpu.parallel.sweep import (
        build_seed_ensemble_runner,
    )

    ds = Dataset(train=Split(data, mask, "train"), test=None, obs_dim=OBS_DIM)
    run_chunk, Pmat, opt_state = build_seed_ensemble_runner(ds, cfg, seeds)

    def run(state, epoch0, n_epochs):
        P, opt = state
        P, opt, hist = run_chunk(P, opt, epoch0, n_epochs)
        return (P, opt), hist

    return run, (Pmat, opt_state)


def make_pytree(cfg, data, mask, seeds):
    """Stacked-pytree ensemble: leaves carry [S, ...]; optax Adam per leaf.
    Same seed-mode key streams as _make_ensemble_chunk (per-replica
    shuffle/mask/model streams keyed by PRNGKey(seed))."""
    model = get_model(cfg)
    S = len(seeds)
    seeds_v = jnp.asarray(seeds, jnp.uint32)
    n = data.shape[0]
    bsz = min(cfg.batch_size, n)
    steps = math.ceil(n / bsz)
    pad = steps * bsz - n
    info = cfg.info
    tx = optax.adam(LEARNING_RATE)

    init_keys = jax.vmap(jax.random.PRNGKey)(seeds_v)
    params = jax.vmap(lambda k: model.init(k, cfg, OBS_DIM))(init_keys)
    opt_state = tx.init(params)

    def replica_loss(p, x_b, m_b, mp_b, k_model, epoch):
        return model.train_loss(p, x_b, m_b, mp_b, k_model, epoch, cfg)[0]

    def total_loss(P, x_b, m_b, mp_b, k_models, epoch):
        per = jax.vmap(replica_loss, (0, 0, 0, 0, 0, None))(
            P, x_b, m_b, mp_b, k_models, epoch)
        return jnp.sum(per), per

    grad_fn = jax.value_and_grad(total_loss, has_aux=True)

    @partial(jax.jit, static_argnames=("n_epochs",), donate_argnums=(0,))
    def run(state, epoch0, n_epochs):
        P, opt = state

        def epoch_body(carry, off):
            P, opt = carry
            epoch = (epoch0 + off).astype(jnp.float32) + 1.0

            def padded(perm):
                return jnp.concatenate([perm, perm[:pad]]) if pad else perm

            ekeys = jax.vmap(
                lambda s: jax.random.fold_in(jax.random.PRNGKey(s),
                                             epoch0 + off))(seeds_v)
            kperms, ksteps = jax.vmap(jax.random.split, out_axes=1)(ekeys)
            perms = jax.vmap(
                lambda k: padded(jax.random.permutation(k, n)))(kperms)
            x_epoch = jnp.take(data, perms, axis=0)
            m_epoch = jnp.take(mask, perms, axis=0)
            step_keys = jax.vmap(jax.vmap(
                lambda k, s: jax.random.split(jax.random.fold_in(k, s)),
                (None, 0)), (0, None))(ksteps, jnp.arange(steps))
            step_keys = jnp.swapaxes(step_keys, 0, 1)  # [steps, S, 2, 2]

            def step_body(carry2, inputs):
                P, opt = carry2
                s, kp = inputs
                x_b = jax.lax.dynamic_slice(
                    x_epoch, (0, s * bsz, 0), (S, bsz, OBS_DIM))
                m_b = jax.lax.dynamic_slice(
                    m_epoch, (0, s * bsz, 0), (S, bsz, OBS_DIM))
                k_mask, k_model = kp[:, 0], kp[:, 1]
                eff_m, mask_p = jax.vmap(
                    lambda k, m: masks_ops.train_masks(info, cfg, k, m))(
                        k_mask, m_b)
                (tot, per), grads = grad_fn(P, x_b, eff_m, mask_p, k_model,
                                            epoch)
                updates, opt = tx.update(grads, opt, P)
                P = optax.apply_updates(P, updates)
                return (P, opt), per

            (P, opt), losses = jax.lax.scan(
                step_body, (P, opt), (jnp.arange(steps), step_keys),
                unroll=min(8, steps))
            return (P, opt), jnp.sum(losses, axis=0)

        (P, opt), hist = jax.lax.scan(epoch_body, (P, opt),
                                      jnp.arange(n_epochs))
        return (P, opt), hist

    return run, (params, opt_state)


VARIANTS = {"engine": make_engine, "pytree": make_pytree}


def _arg(flag, default):
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


def main():
    S = int(_arg("-seeds", "128"))
    batch = int(_arg("-batch", "64"))
    epochs = int(_arg("-epochs", "20"))
    only = _arg("-only", None)
    names = only.split(",") if only else list(VARIANTS)
    fps = _train_flops_per_sample()
    peak = _peak_tflops() or float("nan")
    print(f"device={jax.devices()[0].device_kind} S={S} batch={batch} "
          f"epochs={epochs}")
    print(f"{'variant':>9} {'samples/s':>13} {'TFLOP/s':>9} {'MFU%':>7} "
          f"{'compile_s':>10} {'loss[0]':>10}")
    for name in names:
        cfg, data, mask = _setup(batch)
        run, state = VARIANTS[name](cfg, data, mask, list(range(S)))
        t0 = time.perf_counter()
        state, hist = run(state, jnp.asarray(0), epochs)
        warm = float(np.asarray(hist)[-1].ravel()[0])
        t_c = time.perf_counter() - t0
        best, done = None, epochs
        for _ in range(3):
            t0 = time.perf_counter()
            state, hist = run(state, jnp.asarray(done), epochs)
            float(np.asarray(hist)[-1].ravel()[0])
            dt = time.perf_counter() - t0
            done += epochs
            best = dt if best is None else min(best, dt)
        sps = S * epochs * N_ROWS / best
        tf = sps * fps / 1e12
        print(f"{name:>9} {sps:>13.0f} {tf:>9.3f} {100*tf/peak:>6.2f}% "
              f"{t_c:>10.1f} {warm:>10.4f}", flush=True)


if __name__ == "__main__":
    main()
