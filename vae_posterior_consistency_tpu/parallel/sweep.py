"""Sweep parallelism: vmap whole training runs over seeds / data splits.

The reference runs its (3 data splits) x (alpha) x (missing-rate) sweep as
serial Python loops (reference: src/experiment_main/imputation.py:21-25).
Here a whole axis of the sweep trains simultaneously: `vmap` over an ensemble
axis of parameter pytrees turns N independent runs into one batched XLA
program whose matmuls stack on the MXU (and which can additionally be
dp-sharded across chips).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import optax

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.engine.train import LEARNING_RATE, make_train_step
from vae_posterior_consistency_tpu.models import get_model


def build_seed_ensemble_runner(dataset, cfg: RunConfig, seeds):
    """Compile the n_seeds-replica chunk runner; returns
    (run_chunk, params, opt_state). run_chunk(params, opt_state, epoch0,
    n_epochs) -> (params, opt_state, losses [n_epochs, n_seeds]).
    Exposed separately so benchmarks can time/cost-analyze the compiled
    program directly (bench.py ensemble regime)."""
    model = get_model(cfg)
    seeds = jnp.asarray(seeds, jnp.uint32)
    n_seeds = len(seeds)
    init_keys = jax.vmap(lambda s: jax.random.PRNGKey(s))(seeds)
    params = jax.vmap(lambda k: model.init(k, cfg, dataset.obs_dim))(init_keys)

    tx = optax.adam(LEARNING_RATE)
    opt_state = jax.vmap(tx.init)(params)
    step_fn, _ = make_train_step(cfg, model)

    data, mask = dataset.train.x, dataset.train.mask
    n = data.shape[0]
    bsz = min(cfg.batch_size, n)
    steps = math.ceil(n / bsz)
    pad = steps * bsz - n

    def one_epoch(params, opt_state, key, epoch):
        kperm, kstep = jax.random.split(key)
        perm = jax.random.permutation(kperm, n)
        if pad:
            perm = jnp.concatenate([perm, perm[:pad]])

        def body(carry, s):
            params, opt_state = carry
            idx = jax.lax.dynamic_slice(perm, (s * bsz,), (bsz,))
            x_b = jnp.take(data, idx, axis=0)
            m_b = jnp.take(mask, idx, axis=0)
            params, opt_state, loss = step_fn(
                params, opt_state, x_b, m_b, jax.random.fold_in(kstep, s),
                epoch + 1.0,
            )
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps)
        )
        return params, opt_state, jnp.sum(losses)

    @partial(jax.jit, static_argnames=("n_epochs",), donate_argnums=(0, 1))
    def run_chunk(params, opt_state, epoch0, n_epochs):
        def epoch_body(carry, off):
            params, opt_state = carry
            epoch = (epoch0 + off).astype(jnp.float32)

            def per_seed(p, o, s):
                ekey = jax.random.fold_in(jax.random.PRNGKey(s), epoch0 + off)
                return one_epoch(p, o, ekey, epoch)

            params, opt_state, losses = jax.vmap(per_seed)(params, opt_state,
                                                           seeds)
            return (params, opt_state), losses

        (params, opt_state), hist = jax.lax.scan(
            epoch_body, (params, opt_state), jnp.arange(n_epochs)
        )
        return params, opt_state, hist

    return run_chunk, params, opt_state


def train_seed_ensemble(dataset, cfg: RunConfig, seeds, chunk_epochs: int = 200):
    """Train len(seeds) independent replicas of the same config in one program.

    Returns (ensemble_params, loss_history [n_seeds, epochs]). Each replica
    gets its own init and its own shuffling/mask PRNG stream.
    """
    run_chunk, params, opt_state = build_seed_ensemble_runner(dataset, cfg,
                                                              seeds)
    history = []
    done = 0
    while done < cfg.epoch:
        n_e = min(chunk_epochs, cfg.epoch - done)
        params, opt_state, hist = run_chunk(params, opt_state,
                                            jnp.asarray(done), n_e)
        history.append(jax.device_get(hist))
        done += n_e
    import numpy as np

    return params, np.concatenate(history, axis=0).T  # [n_seeds, epochs]


def train_split_ensemble(datasets, cfg: RunConfig, chunk_epochs: int = 200):
    """Train one replica per DATA SPLIT of the same model family in a single
    batched program — the reference's `vae_type` digit axis
    (reg_vae1/2/3, ... — serial records in Data/imputation_args.json,
    reference loop: src/experiment_main/imputation.py:21-22).

    Each replica gets its own (x, mask) tables (stacked: splits of one UCI
    table share shapes), its own init, and its own mask_p/model key streams;
    the per-epoch shuffle order is shared across replicas (one batched gather
    instead of S) — replicas hold *different datasets*, so a common
    permutation couples nothing. Returns (ensemble_params, loss_history
    [n_splits, epochs]); unstack leaves with `ensemble_replica` to save
    per-config checkpoints.
    """
    model = get_model(cfg)
    S = len(datasets)
    xs = jnp.stack([d.train.x for d in datasets])  # [S, n, D]
    ms = jnp.stack([d.train.mask for d in datasets])
    n = xs.shape[1]
    bsz = min(cfg.batch_size, n)
    steps = math.ceil(n / bsz)
    pad = steps * bsz - n
    obs_dim = xs.shape[2]

    init_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.PRNGKey(cfg.seed), jnp.arange(S))
    params = jax.vmap(lambda k: model.init(k, cfg, obs_dim))(init_keys)
    tx = optax.adam(LEARNING_RATE)
    opt_state = jax.vmap(tx.init)(params)
    step_fn, _ = make_train_step(cfg, model)

    @partial(jax.jit, static_argnames=("n_epochs",), donate_argnums=(0, 1))
    def run_chunk(params, opt_state, epoch0, n_epochs):
        def epoch_body(carry, off):
            params, opt_state = carry
            epoch = (epoch0 + off).astype(jnp.float32) + 1.0
            ekey = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 13),
                                      epoch0 + off)
            kperm, kstep = jax.random.split(ekey)
            perm = jax.random.permutation(kperm, n)
            if pad:
                perm = jnp.concatenate([perm, perm[:pad]])
            x_epoch = jnp.take(xs, perm, axis=1)  # [S, n+pad, D]
            m_epoch = jnp.take(ms, perm, axis=1)

            def body(carry2, s):
                params, opt_state = carry2
                x_b = jax.lax.dynamic_slice(
                    x_epoch, (0, s * bsz, 0), (S, bsz, obs_dim))
                m_b = jax.lax.dynamic_slice(
                    m_epoch, (0, s * bsz, 0), (S, bsz, obs_dim))
                rkeys = jax.vmap(jax.random.fold_in, (None, 0))(
                    jax.random.fold_in(kstep, s), jnp.arange(S))
                params, opt_state, loss = jax.vmap(
                    step_fn, (0, 0, 0, 0, 0, None)
                )(params, opt_state, x_b, m_b, rkeys, epoch)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(steps))
            return (params, opt_state), jnp.sum(losses, axis=0)

        (params, opt_state), hist = jax.lax.scan(
            epoch_body, (params, opt_state), jnp.arange(n_epochs))
        return params, opt_state, hist

    history = []
    done = 0
    while done < cfg.epoch:
        n_e = min(chunk_epochs, cfg.epoch - done)
        params, opt_state, hist = run_chunk(params, opt_state,
                                            jnp.asarray(done), n_e)
        history.append(jax.device_get(hist))
        done += n_e
    import numpy as np

    return params, np.concatenate(history, axis=0).T  # [S, epochs]


def ensemble_replica(params, i):
    """Extract replica i's parameter pytree from a vmapped ensemble."""
    return jax.tree_util.tree_map(lambda leaf: leaf[i], params)


def train_alpha_ensemble(dataset, cfg: RunConfig, alphas,
                         chunk_epochs: int = 200, seed: int = 0):
    """Train the reference's alpha sweep axis (serial Python loop at
    src/experiment_main/imputation.py:24) as ONE batched program: a replica
    per regularization strength, vmapped over (params, opt_state, alpha).

    alpha enters every family's composite loss purely arithmetically
    (e.g. models/gauss.py:177), so a traced per-replica scalar substitutes
    into cfg via cfg.replace. All replicas share the data, shuffling, and
    mask streams — isolating the effect of alpha, which is what the sweep
    studies. Returns (ensemble_params, loss_history [n_alphas, epochs]).
    """
    model = get_model(cfg)
    alphas = jnp.asarray(alphas, jnp.float32)
    n_alphas = len(alphas)
    init_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.PRNGKey(seed), jnp.arange(n_alphas))
    params = jax.vmap(lambda k: model.init(k, cfg, dataset.obs_dim))(init_keys)

    tx = optax.adam(LEARNING_RATE)
    opt_state = jax.vmap(tx.init)(params)

    data, mask = dataset.train.x, dataset.train.mask
    n = data.shape[0]
    bsz = min(cfg.batch_size, n)
    steps = math.ceil(n / bsz)
    pad = steps * bsz - n
    info = cfg.info

    from vae_posterior_consistency_tpu.ops import masks as masks_ops

    def step_fn(params, opt_state, alpha, x_b, m_b, key, epoch):
        k_mask, k_model = jax.random.split(key)
        if info.regularized:
            mask_p = masks_ops.sub_mask(k_mask, m_b, cfg.p_missingness)
        else:
            mask_p = jnp.ones_like(m_b)

        def loss_fn(p):
            return model.train_loss(p, x_b, m_b, mask_p, k_model, epoch,
                                    cfg.replace(alpha=alpha))

        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @partial(jax.jit, static_argnames=("n_epochs",), donate_argnums=(0, 1))
    def run_chunk(params, opt_state, epoch0, n_epochs):
        def epoch_body(carry, off):
            params, opt_state = carry
            epoch = (epoch0 + off).astype(jnp.float32) + 1.0
            ekey = jax.random.fold_in(jax.random.PRNGKey(seed + 7),
                                      epoch0 + off)
            kperm, kstep = jax.random.split(ekey)
            perm = jax.random.permutation(kperm, n)
            if pad:
                perm = jnp.concatenate([perm, perm[:pad]])
            x_epoch = jnp.take(data, perm, axis=0)
            m_epoch = jnp.take(mask, perm, axis=0)

            def body(carry2, s):
                params, opt_state = carry2
                x_b = jax.lax.dynamic_slice(
                    x_epoch, (s * bsz, 0), (bsz, x_epoch.shape[1]))
                m_b = jax.lax.dynamic_slice(
                    m_epoch, (s * bsz, 0), (bsz, m_epoch.shape[1]))
                skey = jax.random.fold_in(kstep, s)
                params, opt_state, loss = jax.vmap(
                    step_fn, (0, 0, 0, None, None, None, None)
                )(params, opt_state, alphas, x_b, m_b, skey, epoch)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(steps))
            return (params, opt_state), jnp.sum(losses, axis=0)

        (params, opt_state), hist = jax.lax.scan(
            epoch_body, (params, opt_state), jnp.arange(n_epochs))
        return params, opt_state, hist

    history = []
    done = 0
    while done < cfg.epoch:
        n_e = min(chunk_epochs, cfg.epoch - done)
        params, opt_state, hist = run_chunk(params, opt_state,
                                            jnp.asarray(done), n_e)
        history.append(jax.device_get(hist))
        done += n_e
    import numpy as np

    return params, np.concatenate(history, axis=0).T  # [n_alphas, epochs]
