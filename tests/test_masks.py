"""Mask-generator semantics (reference: src/utils/utils.py:24-120)."""

import jax
import jax.numpy as jnp
import numpy as np

from vae_posterior_consistency_tpu.ops import masks


def test_mcar_rate():
    m = masks.mcar_mask(jax.random.PRNGKey(0), (4000, 10), 30)
    assert abs(float(m.mean()) - 0.7) < 0.01
    m50 = masks.mcar_mask(jax.random.PRNGKey(1), (4000, 10), 50)
    assert abs(float(m50.mean()) - 0.5) < 0.01


def test_sub_mask_is_subset():
    key = jax.random.PRNGKey(2)
    base = masks.mcar_mask(key, (500, 8), 30)
    sub = masks.sub_mask(jax.random.PRNGKey(3), base, 30)
    # mask_p can only hide cells, never reveal
    assert bool(jnp.all(sub <= base))
    assert float(sub.mean()) < float(base.mean())


def test_eddi_drop_mean_rate():
    # keep prob per cell is 1 - min(U,0.99): E[keep] ~ integral(1-u) ~ 0.505
    m = masks.eddi_drop_mask(jax.random.PRNGKey(4), (4000, 10))
    assert abs(float(m.mean()) - 0.505) < 0.02


def test_mnar_mean_half():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(200, 6)),
                    jnp.float32)
    m = masks.mnar_mask_mean_half(x)
    # second half of features fully observed
    assert bool(jnp.all(m[:, 3:] == 1.0))
    # first half: hidden iff above column mean
    expected = (x[:, :3] <= x[:, :3].mean(axis=0)).astype(jnp.float32)
    assert bool(jnp.all(m[:, :3] == expected))


def test_mnar_var_all():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(200, 4)),
                    jnp.float32)
    m = masks.mnar_mask_var_all(x)
    var = jnp.var(x, axis=0, ddof=1)
    expected = (x <= var[None, :]).astype(jnp.float32)
    assert bool(jnp.all(m == expected))


def test_toy_mask():
    m = masks.toy_mask(jax.random.PRNGKey(5), 100, 30)
    assert m.shape == (100, 2)
    assert bool(jnp.all(m[:, 0] == 1.0))
    assert int(m[:, 1].sum()) == 70  # ceil(100 * 0.7)
