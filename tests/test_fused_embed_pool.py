"""Fused EDDI embed+pool kernel (ops/fused_embed_pool.py): the Pallas
forward and custom-VJP backward must reproduce the XLA einsum formulation
(models/layers.py) to float tolerance for values and for every gradient,
across padding regimes (D=784 -> 896 lanes, ragged batch tiles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_posterior_consistency_tpu.ops import fused_embed_pool as fep


def _case(key, B, D, K, S=2):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    x = jax.random.normal(ks[0], (B, D), jnp.float32)
    masks = (jax.random.uniform(ks[1], (S, B, D)) < 0.7).astype(jnp.float32)
    A = jax.random.normal(ks[2], (D, K), jnp.float32) * 0.3
    C = jax.random.normal(ks[3], (D, K), jnp.float32) * 0.3
    return x, masks, A, C


@pytest.mark.parametrize("B,D,K", [
    (32, 784, 10),   # MNIST shape, one ragged batch tile (32 -> pad 32)
    (300, 100, 10),  # both dims padded (300->512 rows, 100->128 lanes)
    (256, 128, 4),   # exactly aligned
])
def test_forward_matches_reference(B, D, K):
    x, masks, A, C = _case(0, B, D, K)
    got = jax.jit(fep.embed_pool)(x, masks, A, C)
    want = fep.embed_pool_reference(x, masks, A, C)
    assert got.shape == (2, B, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_single_mask_branch():
    x, masks, A, C = _case(1, 64, 784, 10, S=1)
    got = jax.jit(fep.embed_pool)(x, masks, A, C)
    want = fep.embed_pool_reference(x, masks, A, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    x, masks, A, C = _case(2, 48, 200, 6)

    def scalar(fn):
        def f(x, masks, A, C):
            out = fn(x, masks, A, C)
            # non-uniform weights so every (s,b,k) grad path is distinct
            w = (jnp.arange(out.size, dtype=jnp.float32)
                 .reshape(out.shape) / out.size)
            return jnp.sum(out * w)
        return f

    g_k = jax.jit(jax.grad(scalar(fep.embed_pool), argnums=(0, 1, 2, 3)))(
        x, masks, A, C)
    g_r = jax.jit(jax.grad(scalar(fep.embed_pool_reference),
                           argnums=(0, 1, 2, 3)))(x, masks, A, C)
    for name, a, b in zip(("dx", "dmasks", "dA", "dC"), g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_context_switch():
    assert fep._FUSED[-1] == "off"  # XLA fusion measured faster (module doc)
    with fep.fused_embed_pool("on"):
        assert fep.enabled()
        with fep.fused_embed_pool("off"):
            assert not fep.enabled()
    with pytest.raises(ValueError):
        fep.fused_embed_pool("maybe")


def test_wired_dispatch_through_pointnet_encoders():
    """The layers-level dispatch: under fused_embed_pool('on') the EDDI
    encoders route through the Pallas kernel and reproduce the XLA path."""
    from vae_posterior_consistency_tpu.models import layers

    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    D, B, K, L = 784, 24, 10, 8
    params = layers.pointnet_encoder_init(ks[0], D, latent_dim=L, emb_dim=K,
                                          trunk_widths=(32, 16))
    x = jax.random.uniform(ks[1], (B, D))
    mq = (jax.random.uniform(ks[2], (B, D)) < 0.7).astype(jnp.float32)
    mp = (jax.random.uniform(ks[3], (B, D)) < 0.5).astype(jnp.float32) * mq

    base1 = layers.pointnet_encoder_apply(params, x, mq)
    base2 = layers.pointnet_encoder_apply_2masks(params, x, mq, mp)
    with fep.fused_embed_pool("on"):
        got1 = layers.pointnet_encoder_apply(params, x, mq)
        got2 = layers.pointnet_encoder_apply_2masks(params, x, mq, mp)
    for a, b in zip(got1 + got2, base1 + base2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
