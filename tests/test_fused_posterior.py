"""Fused posterior kernel vs pure-jnp reference: values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from vae_posterior_consistency_tpu.ops.fused_posterior import (
    fused_posterior,
    fused_posterior_reference,
)


def _inputs(B=13, L=10, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    mk = lambda k: jax.random.normal(k, (B, L))
    return tuple(mk(k) for k in ks)


def test_forward_matches_reference():
    args = _inputs()
    ours = fused_posterior(*args)
    ref = fused_posterior_reference(*args)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-5,
                                   atol=1e-5)


def test_forward_matches_reference_padded_shapes():
    # non-tile-aligned B and L exercise the masking
    args = _inputs(B=7, L=3, seed=1)
    ours = fused_posterior(*args)
    ref = fused_posterior_reference(*args)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-5,
                                   atol=1e-5)


def test_custom_vjp_matches_autodiff():
    args = _inputs(B=6, L=5, seed=2)

    def scalarize(fn):
        def f(mq, lq, mp, lp):
            z_q, z_p, klq, klp, klreg = fn(mq, lq, mp, lp, args[4], args[5])
            # weigh every output so all cotangents are exercised
            return (jnp.sum(z_q * 1.3) + jnp.sum(z_p * 0.7)
                    + 2.0 * klq + 3.0 * klp + 0.5 * klreg)

        return f

    g_ours = jax.grad(scalarize(fused_posterior), argnums=(0, 1, 2, 3))(*args[:4])
    g_ref = jax.grad(scalarize(fused_posterior_reference),
                     argnums=(0, 1, 2, 3))(*args[:4])
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_custom_vjp_eps_cotangents():
    """The noise inputs are differentiable too (z = mean + eps*std, so
    d/d_eps = dz*std): the VJP once returned zeros for eps_q/eps_p, silently
    diverging from the XLA reference for anything differentiating through
    the noise (e.g. sticking-the-landing estimators)."""
    args = _inputs(B=6, L=5, seed=3)

    def scalarize(fn):
        def f(*a):
            z_q, z_p, klq, klp, klreg = fn(*a)
            return (jnp.sum(z_q * 1.3) + jnp.sum(z_p * 0.7)
                    + 2.0 * klq + 3.0 * klp + 0.5 * klreg)

        return f

    g_ours = jax.grad(scalarize(fused_posterior), argnums=(4, 5))(*args)
    g_ref = jax.grad(scalarize(fused_posterior_reference),
                     argnums=(4, 5))(*args)
    for a, b in zip(g_ours, g_ref):
        assert float(jnp.abs(a).max()) > 0.0  # not the old silent zeros
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_jittable_and_vmappable():
    args = _inputs(B=8, L=4, seed=3)
    jitted = jax.jit(fused_posterior)
    outs = jitted(*args)
    assert outs[0].shape == (8, 4)
    # vmap over an ensemble axis
    stacked = tuple(jnp.stack([a, a * 0.5]) for a in args)
    vouts = jax.vmap(fused_posterior)(*stacked)
    assert vouts[0].shape == (2, 8, 4)


def test_multi_block_grid_accumulation():
    """The row grid must accumulate the KL scalars across blocks and mask the
    row padding of the final partial block."""
    from vae_posterior_consistency_tpu.ops.fused_posterior import (
        _fused_forward_impl,
        fused_posterior_reference,
    )

    rng = np.random.default_rng(5)
    B, L = 40, 10  # block_rows=16 -> 3 blocks, last one partial (40 -> 48)
    args = [jnp.asarray(rng.normal(size=(B, L)), jnp.float32)
            for _ in range(6)]
    got = _fused_forward_impl(*args, interpret=True, block_rows=16)
    want = fused_posterior_reference(*args)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-5,
                                   atol=2e-5)
