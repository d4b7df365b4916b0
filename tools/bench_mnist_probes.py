"""MNIST-EDDI optimizer/layout probes (VERDICT r3 item 3).

The r3b profile names two non-matmul thieves in the b1024 training step
(profiles/mnist_eddi_r3b, tools/profile_summary.py): layout/format
conversions ~17% and the flat-grad concatenate ~10%. Per-step anatomy from
the trace (4-step epochs, 30 epochs): concat 24.7 us/step @ 361 GB/s,
weight-unravel reshapes ~12 us/step, [2048, 784] loss-side layout copies
~17 us/step, per-epoch table-gather copies ~6.5 us/step.

This tool measures design variants of the chunk runner head-to-head on the
attached chip, same protocol as bench.py (readback-synced, epoch counter
varied between reps, best of 3):

  flat      — the shipping engine (_build_epoch_runner): params as ONE flat
              vector, fused Adam, unravel in the loss (baseline).
  pytree    — params stay a pytree end-to-end; optax Adam per leaf
              (the r3 probe: removes unravel copies + grad concat, adds
              ~28 per-leaf optimizer kernels).
  seg2      — segmented flat params: TWO flat vectors (encoder | decoder),
              each with its own fused Adam; halves each concat, doubles
              optimizer kernel count.
  bigleaf   — pytree params; manual Adam where the update math is written
              once and tree_mapped (donated buffers); identical kernel
              structure to pytree but no optax bookkeeping.

Run (serialize with other TPU work):
    PYTHONPATH=.:/root/.axon_site python3 tools/bench_mnist_probes.py [-epochs 30]
"""

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

from bench import (
    MNIST_DIM,
    MNIST_ROWS,
    _mnist_flops_per_sample,
    _peak_tflops,
)
from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.engine.train import LEARNING_RATE
from vae_posterior_consistency_tpu.models import get_model
from vae_posterior_consistency_tpu.ops import masks

BATCH = 1024


#: regime -> (vae_type, rows, dim, batch). 'flagship' is bench.py's wine-
#: shaped Reg_VAE table regime (where the flat runner originally won +26%).
REGIMES = {
    "mnist": ("reg_EDDI_mnist1", MNIST_ROWS, MNIST_DIM, BATCH),
    "flagship": ("reg_vae1", 4898, 12, 64),
}
_REGIME = ["mnist"]


def _setup(compute_dtype="float32"):
    vae_type, rows, dim, batch = REGIMES[_REGIME[-1]]
    # data_type drives the width presets (mnist -> 500-wide trunks,
    # models/gauss.py:_decoder_widths) — it must match the regime
    data_type = "mnist" if _REGIME[-1] == "mnist" else "wine"
    cfg = RunConfig(vae_type=vae_type, data_type=data_type,
                    reg_type="kl_reg", batch_size=batch, latent_dim=10,
                    K=10, alpha=1.0, p_missingness=30,
                    compute_dtype=compute_dtype)
    model = get_model(cfg)
    rng = np.random.default_rng(1)
    data = jnp.asarray(rng.uniform(0, 1, (rows, dim)), jnp.float32)
    mask = jnp.asarray(rng.random((rows, dim)) < 0.7, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), cfg, dim)
    return cfg, model, data, mask, params


def _epoch_scaffold(cfg, model, data, mask, loss_and_update):
    """The engine's epoch/step scan structure with a pluggable
    (state, x_b, m_b, mp, key, epoch) -> (state, loss) body, so every
    variant differs ONLY in parameter layout + optimizer update."""
    n = data.shape[0]
    bsz = min(cfg.batch_size, n)
    steps = math.ceil(n / bsz)
    pad = steps * bsz - n
    info = cfg.info

    @partial(jax.jit, static_argnames=("n_epochs",), donate_argnums=(0,))
    def run_chunk(state, key, epoch0, n_epochs):
        def epoch_body(carry, epoch_off):
            state = carry
            epoch = epoch0 + epoch_off
            ekey = jax.random.fold_in(key, epoch)
            kperm, kstep = jax.random.split(ekey)
            perm = jax.random.permutation(kperm, n)
            if pad:
                perm = jnp.concatenate([perm, perm[:pad]])
            x_epoch = jnp.take(data, perm, axis=0)
            m_epoch = jnp.take(mask, perm, axis=0)
            skeys = jax.vmap(lambda s: jax.random.fold_in(kstep, s))(
                jnp.arange(steps))
            kpairs = jax.vmap(jax.random.split)(skeys)

            def step_body(carry2, inputs):
                state = carry2
                s, kpair = inputs
                x_b = jax.lax.dynamic_slice(
                    x_epoch, (s * bsz, 0), (bsz, x_epoch.shape[1]))
                m_b = jax.lax.dynamic_slice(
                    m_epoch, (s * bsz, 0), (bsz, m_epoch.shape[1]))
                eff_mask, mask_p = masks.train_masks(info, cfg, kpair[0], m_b)
                state, loss = loss_and_update(
                    state, x_b, eff_mask, mask_p, kpair[1],
                    (epoch + 1).astype(jnp.float32))
                return state, loss

            state, losses = jax.lax.scan(
                step_body, state, (jnp.arange(steps), kpairs),
                unroll=min(8, steps))
            return state, jnp.sum(losses)

        state, epoch_losses = jax.lax.scan(epoch_body, state,
                                           jnp.arange(n_epochs))
        return state, epoch_losses

    return run_chunk


def make_flat(cfg, model, data, mask, params):
    from jax.flatten_util import ravel_pytree

    pflat, unravel = ravel_pytree(params)
    tx = optax.adam(LEARNING_RATE)

    def body(state, x, m, mp, k, epoch):
        pf, opt = state

        def loss_fn(pf):
            return model.train_loss(unravel(pf), x, m, mp, k, epoch, cfg)[0]

        loss, g = jax.value_and_grad(loss_fn)(pf)
        upd, opt = tx.update(g, opt, pf)
        return (optax.apply_updates(pf, upd), opt), loss

    run = _epoch_scaffold(cfg, model, data, mask, body)
    return run, (pflat, tx.init(pflat))


def make_pytree(cfg, model, data, mask, params):
    tx = optax.adam(LEARNING_RATE)

    def body(state, x, m, mp, k, epoch):
        p, opt = state

        def loss_fn(p):
            return model.train_loss(p, x, m, mp, k, epoch, cfg)[0]

        loss, g = jax.value_and_grad(loss_fn)(p)
        upd, opt = tx.update(g, opt, p)
        return (optax.apply_updates(p, upd), opt), loss

    run = _epoch_scaffold(cfg, model, data, mask, body)
    return run, (params, tx.init(params))


def make_seg2(cfg, model, data, mask, params):
    """Two flat segments: encoder vs decoder. Each concat halves; Adam runs
    as two fused kernels."""
    from jax.flatten_util import ravel_pytree

    enc_flat, enc_unr = ravel_pytree(params["encoder"])
    dec_flat, dec_unr = ravel_pytree(params["decoder"])
    tx = optax.adam(LEARNING_RATE)

    def body(state, x, m, mp, k, epoch):
        (ef, df), opt = state

        def loss_fn(ef, df):
            p = {"encoder": enc_unr(ef), "decoder": dec_unr(df)}
            return model.train_loss(p, x, m, mp, k, epoch, cfg)[0]

        loss, g = jax.value_and_grad(loss_fn, argnums=(0, 1))(ef, df)
        upd, opt = tx.update(g, opt, (ef, df))
        return (optax.apply_updates((ef, df), upd), opt), loss

    run = _epoch_scaffold(cfg, model, data, mask, body)
    seg0 = (enc_flat, dec_flat)
    return run, (seg0, tx.init(seg0))


def make_bigleaf(cfg, model, data, mask, params):
    """Pytree params, hand-written Adam tree_map (no optax chain), count
    carried once. Same kernel structure as pytree; isolates optax overhead."""
    b1, b2, eps = 0.9, 0.999, 1e-8

    def body(state, x, m, mp, k, epoch):
        p, mom, vel, t = state

        def loss_fn(p):
            return model.train_loss(p, x, m, mp, k, epoch, cfg)[0]

        loss, g = jax.value_and_grad(loss_fn)(p)
        t = t + 1.0
        lr_t = LEARNING_RATE * jnp.sqrt(1 - b2**t) / (1 - b1**t)
        mom = jax.tree_util.tree_map(lambda m_, g_: b1 * m_ + (1 - b1) * g_,
                                     mom, g)
        vel = jax.tree_util.tree_map(lambda v_, g_: b2 * v_ + (1 - b2) * g_ * g_,
                                     vel, g)
        p = jax.tree_util.tree_map(
            lambda p_, m_, v_: p_ - lr_t * m_ / (jnp.sqrt(v_) + eps),
            p, mom, vel)
        return (p, mom, vel, t), loss

    run = _epoch_scaffold(cfg, model, data, mask, body)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return run, (params, zeros,
                 jax.tree_util.tree_map(jnp.zeros_like, params),
                 jnp.float32(0.0))


def make_engine(cfg, model, data, mask, params):
    """The SHIPPING engine runner (engine/train._build_epoch_runner),
    adapted to the probe harness's (state, key, epoch0, n_epochs) calling
    convention — the ground-truth baseline the probes must beat."""
    from vae_posterior_consistency_tpu.engine.train import (
        _build_epoch_runner,
    )

    runner = _build_epoch_runner(cfg, data, mask, model,
                                 template_params=params)

    def run(state, key, epoch0, n_epochs):
        p, opt = state
        p, opt, losses = runner(p, opt, key, epoch0, n_epochs)
        return (p, opt), losses

    return run, (params, runner.tx.init(params))


VARIANTS = {
    "engine": make_engine,
    "flat": make_flat,
    "pytree": make_pytree,
    "seg2": make_seg2,
    "bigleaf": make_bigleaf,
}

#: variants suffixed _bf16 run the same design under compute_dtype=bfloat16


def measure(name, epochs, profile_dir=None):
    dtype = "float32"
    base = name
    if name.endswith("_bf16"):
        base, dtype = name[:-5], "bfloat16"
    cfg, model, data, mask, params = _setup(compute_dtype=dtype)
    rows = data.shape[0]
    run, state = VARIANTS[base](cfg, model, data, mask, params)
    t0 = time.perf_counter()
    state, losses = run(state, jax.random.PRNGKey(1), jnp.asarray(0), epochs)
    warm_loss = float(losses[-1])  # readback barrier (axon quirk)
    t_compile = time.perf_counter() - t0
    best, done = None, epochs
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = run(state, jax.random.PRNGKey(1), jnp.asarray(done),
                            epochs)
        float(losses[-1])
        dt = time.perf_counter() - t0
        done += epochs
        best = dt if best is None else min(best, dt)
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            state, losses = run(state, jax.random.PRNGKey(1),
                                jnp.asarray(done), epochs)
            float(losses[-1])
    sps = epochs * rows / best
    return sps, t_compile, warm_loss, float(losses[-1])


def main():
    epochs = 30
    if "-epochs" in sys.argv:
        epochs = int(sys.argv[sys.argv.index("-epochs") + 1])
    if "-regime" in sys.argv:
        _REGIME.append(sys.argv[sys.argv.index("-regime") + 1])
    only = None
    if "-only" in sys.argv:
        only = sys.argv[sys.argv.index("-only") + 1].split(",")
    profile_dir = None
    if "-profile" in sys.argv:
        profile_dir = sys.argv[sys.argv.index("-profile") + 1]
    fps = _mnist_flops_per_sample()
    peak = _peak_tflops() or float("nan")
    print(f"device={jax.devices()[0].device_kind} b={BATCH} epochs={epochs} "
          f"flops/sample={fps/1e6:.2f}M peak={peak}")
    print(f"{'variant':>9} {'samples/s':>12} {'TFLOP/s':>9} {'MFU%':>7} "
          f"{'compile_s':>10} {'loss':>10}")
    for name in (only or VARIANTS):
        sps, t_c, _wl, loss = measure(name, epochs, profile_dir=profile_dir)
        tf = sps * fps / 1e12
        print(f"{name:>9} {sps:>12.0f} {tf:>9.2f} {100*tf/peak:>6.2f}% "
              f"{t_c:>10.1f} {loss:>10.4f}", flush=True)


if __name__ == "__main__":
    main()
