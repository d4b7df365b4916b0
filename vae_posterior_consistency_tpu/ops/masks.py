"""On-device missingness-mask generation with keyed `jax.random` PRNG.

The reference draws every training/eval mask on the *host* with unseeded NumPy,
per batch (reference: src/utils/utils.py:24-120; called from the hot loop at
src/experiment_main/train.py:31-58) — a host<->device sync every step. Here all
mask generators are pure, jit-able device functions of an explicit PRNG key, so
the whole training run stays on-chip.

Semantics parity (element distributions match the reference exactly):
- `mcar_mask`            <- create_missing_uci       (utils.py:36-39)
- `eddi_drop_mask`       <- create_missing_uci_drop_eddi (utils.py:42-45)
- `mnar_mask_*`          <- introduce_mising_mnar_*  (utils.py:48-105)
- `toy_mask`             <- create_missing_toy       (utils.py:24-33)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mcar_mask(key: jax.Array, shape, missing_rate) -> jax.Array:
    """Element-wise Bernoulli MCAR observation mask.

    `True` (1.0) = observed. Each cell is observed with probability
    `1 - missing_rate/100` (reference: src/utils/utils.py:36-39).
    """
    rate = jnp.asarray(missing_rate, jnp.float32) / 100.0
    return (jax.random.uniform(key, shape) < (1.0 - rate)).astype(jnp.float32)


def eddi_drop_mask(key: jax.Array, shape) -> jax.Array:
    """EDDI training dropout mask: per-cell keep-prob `1 - min(U(0,1), 0.99)`.

    Two independent draws per cell, matching `bernoulli.rvs(1 - min(rand, .99))`
    (reference: src/utils/utils.py:42-45).
    """
    k1, k2 = jax.random.split(key)
    temp = jnp.minimum(jax.random.uniform(k1, shape), 0.99)
    return (jax.random.uniform(k2, shape) < (1.0 - temp)).astype(jnp.float32)


def sub_mask(key: jax.Array, mask: jax.Array, p_missingness) -> jax.Array:
    """The posterior-consistency `mask_p`: impoverish `mask` by an extra MCAR draw.

    mask_p = mask * Bernoulli(1 - p_missingness/100)
    (reference: src/experiment_main/train.py:54-55).
    """
    return mask * mcar_mask(key, mask.shape, p_missingness)


# ---------------------------------------------------------------------------
# MNAR generators — deterministic functions of the data (no PRNG)
# ---------------------------------------------------------------------------


def _mnar_threshold(x: jax.Array, stat: str, half: bool) -> jax.Array:
    n, d = x.shape
    d_sel = d // 2 if half else d
    cols = x[:, :d_sel]
    thresh = jnp.mean(cols, axis=0) if stat == "mean" else jnp.var(cols, axis=0, ddof=1)
    hidden = cols > thresh  # hide values above the per-column statistic
    mask = jnp.ones((n, d), jnp.float32)
    return mask.at[:, :d_sel].set(jnp.where(hidden, 0.0, 1.0))


def mnar_mask_mean_half(x: jax.Array) -> jax.Array:
    """Hide cells above the column mean in the first D/2 features
    (reference: src/utils/utils.py:48-60)."""
    return _mnar_threshold(x, "mean", half=True)


def mnar_mask_mean_all(x: jax.Array) -> jax.Array:
    """Hide cells above the column mean in all features
    (reference: src/utils/utils.py:63-75)."""
    return _mnar_threshold(x, "mean", half=False)


def mnar_mask_var_all(x: jax.Array) -> jax.Array:
    """Hide cells above the column variance in all features
    (reference: src/utils/utils.py:78-90)."""
    return _mnar_threshold(x, "var", half=False)


def mnar_mask_var_half(x: jax.Array) -> jax.Array:
    """Hide cells above the column variance in the first D/2 features
    (reference: src/utils/utils.py:93-105)."""
    return _mnar_threshold(x, "var", half=True)


MNAR_GENERATORS = {
    "half_features_mnar_mean": mnar_mask_mean_half,
    "all_features_mnar_mean": mnar_mask_mean_all,
    "all_features_mnar_var": mnar_mask_var_all,
    "half_features_mnar_var": mnar_mask_var_half,
}


def toy_mask(key: jax.Array, batch_size: int, missing_rate) -> jax.Array:
    """2-column toy mask: column 0 fully observed; a random
    `ceil(B * (1-rate))`-subset of rows observes column 1
    (reference: src/utils/utils.py:24-33)."""
    rate = float(missing_rate) / 100.0
    n_given = int(-(-batch_size * (1.0 - rate) // 1))  # ceil
    perm = jax.random.permutation(key, batch_size)
    col1 = jnp.zeros((batch_size,), jnp.float32).at[perm[:n_given]].set(1.0)
    return jnp.stack([jnp.ones((batch_size,), jnp.float32), col1], axis=1)


def train_masks(info, cfg, k_mask, mask):
    """The reference's per-batch training-mask dispatch
    (src/experiment_main/train.py:31-58), returning (eff_mask, mask_p):
      reg families:      mask_p = MCAR(p_missingness)*mask, eff = mask
      with_drop vanilla: eff = mask * eddi_drop,  mask_p = ones
      plain vanilla:     eff = mask,              mask_p = ones
    ONE definition serves the eager step, the chunked hot loop, the
    early-stopping validation objective, and the sweep ensembles — the
    training and validation objectives cannot drift apart."""
    if info.regularized:
        return mask, sub_mask(k_mask, mask, cfg.p_missingness)
    if info.with_drop:
        return mask * eddi_drop_mask(k_mask, mask.shape), jnp.ones_like(mask)
    return mask, jnp.ones_like(mask)
