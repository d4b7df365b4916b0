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


def train_seed_ensemble(dataset, cfg: RunConfig, seeds, chunk_epochs: int = 200):
    """Train len(seeds) independent replicas of the same config in one program.

    Returns (ensemble_params, loss_history [n_seeds, epochs]). Each replica
    gets its own init and its own shuffling/mask PRNG stream.
    """
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
