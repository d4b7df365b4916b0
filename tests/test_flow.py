"""Spline-flow invertibility, log-det correctness, and reference parity of the
forward spline math (reference: src/models/VAE.py:1680-1857)."""

import jax
import jax.numpy as jnp
import numpy as np

from vae_posterior_consistency_tpu.nn import flow


def test_forward_inverse_roundtrip():
    key = jax.random.PRNGKey(0)
    pdf = jax.random.normal(key, (32, 10, 10))
    x = jnp.linspace(-0.95, 0.95, 10)[None, :].repeat(32, 0)
    y, ld = flow.unconstrained_linear_spline(x, pdf, inverse=False,
                                             tails="linear")
    x2, ld_inv = flow.unconstrained_linear_spline(y, pdf, inverse=True,
                                                  tails="linear")
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-3)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=2e-3)


def test_tails_identity():
    pdf = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 10))
    x = jnp.asarray([[-3.0] * 10, [3.0] * 10, [1.5] * 10, [-1.5] * 10])
    y, ld = flow.unconstrained_linear_spline(x, pdf, inverse=False,
                                             tails="linear")
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    np.testing.assert_allclose(np.asarray(ld), 0.0)
    # clamp mode (default): everything lands inside the interval
    y_c, _ = flow.unconstrained_linear_spline(x, pdf, inverse=False)
    assert float(jnp.abs(y_c).max()) <= 1.0


def test_flow_logprob_consistency():
    """flow_forward's emitted log q(z) must equal flow_log_prob(z)."""
    ctx = jax.random.normal(jax.random.PRNGKey(2), (64, 100))
    z, lp = flow.flow_forward(jax.random.PRNGKey(3), ctx, 10, tails="linear")
    lp2 = flow.flow_log_prob(z, ctx, 10, tails="linear")
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), atol=5e-3)


def test_forward_matches_reference_linear_spline_math():
    """Golden check of the in-interval forward map against a NumPy
    re-derivation of the Mueller et al. piecewise-linear CDF
    (reference math: src/models/VAE.py:1754-1767)."""
    rng = np.random.default_rng(0)
    pdf_logits = rng.normal(size=(1, 3, 5)).astype(np.float32)
    x = np.asarray([[-0.6, 0.0, 0.7]], np.float32)

    y, ld = flow.linear_spline_forward(
        jnp.asarray(x), jnp.asarray(pdf_logits)
    )
    # NumPy re-derivation
    e = np.exp(pdf_logits - pdf_logits.max(-1, keepdims=True))
    pdf = e / e.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((1, 3, 1)), np.cumsum(pdf, -1)], -1)
    cdf[..., -1] = 1.0
    xn = (x + 1.0) / 2.0
    pos = xn * 5
    idx = np.clip(np.floor(pos).astype(int), 0, 4)
    alpha = pos - idx
    out = np.take_along_axis(cdf[..., :-1], idx[..., None], -1)[..., 0]
    out = out + alpha * np.take_along_axis(pdf, idx[..., None], -1)[..., 0]
    expect_y = np.clip(out, 0, 1) * 2.0 - 1.0
    expect_ld = np.log(np.take_along_axis(pdf, idx[..., None], -1)[..., 0]) - np.log(0.2)
    np.testing.assert_allclose(np.asarray(y), expect_y, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ld), expect_ld, atol=2e-4)


def test_flow_density_normalizes():
    """MC check: E_{z~q}[1] via importance sampling from the base — the flow
    must define a proper density (integrates to ~1 per dim)."""
    ctx = jax.random.normal(jax.random.PRNGKey(4), (1, 100))
    # importance-sample from a wide proposal over one latent dim grid
    grid = jnp.linspace(-4, 4, 2001)
    zs = jnp.zeros((2001, 10)).at[:, 0].set(grid)
    lp = flow.flow_log_prob(zs, jnp.repeat(ctx, 2001, 0), 10,
                            tails="linear")  # [2001, 10]
    dens = jnp.exp(lp[:, 0])
    integral = float(jnp.trapezoid(dens, grid))
    assert abs(integral - 1.0) < 0.02


def test_flow_actnorm_roundtrip_and_training():
    """flow_actnorm=True routes the spline stack through composite_apply with
    ActNorm affines interleaved (the layer the reference comments out of its
    Flow, VAE.py:1827): forward samples and inverse log-probs must stay
    consistent, identity-init must reproduce the plain stack, and the flow
    family must still train."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.models import flow_vae, get_model

    # linear tails: the spline is globally invertible, so forward/inverse
    # log-probs must agree even when ActNorm pushes values outside the
    # spline interval (the clamp default is intentionally non-invertible
    # out-of-domain — PARITY.md deviation #5)
    cfg = RunConfig(vae_type="vanilla_flow1", latent_dim=4, hid_dim=16,
                    flow_actnorm=True, flow_tails="linear")
    D, B = 6, 12
    params = flow_vae.init(jax.random.PRNGKey(0), cfg, D)
    assert "actnorm" in params and len(params["actnorm"]) == 3
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, D))
    m = (jax.random.uniform(jax.random.PRNGKey(2), (B, D)) < 0.7).astype(
        jnp.float32)

    # identity init: actnorm path == plain spline stack
    cfg0 = cfg.replace(flow_actnorm=False)
    p0 = {k: v for k, v in params.items() if k != "actnorm"}
    enc_a = jax.jit(lambda p, k: flow_vae.encode(p, x, m, k, cfg))
    enc_0 = jax.jit(lambda p, k: flow_vae.encode(p, x, m, k, cfg0))
    z_a, lp_a = enc_a(params, jax.random.PRNGKey(3))
    z_0, lp_0 = enc_0(p0, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(z_a), np.asarray(z_0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lp_a), np.asarray(lp_0), atol=1e-6)

    # with NON-identity actnorm: forward log-prob must agree with the
    # inverse-pass evaluation of the same z (change-of-variables consistency
    # through composite_apply in both directions)
    params["actnorm"] = [
        {"log_scale": 0.1 * jax.random.normal(jax.random.PRNGKey(10 + i), (4,)),
         "shift": 0.1 * jax.random.normal(jax.random.PRNGKey(20 + i), (4,))}
        for i in range(3)
    ]
    z, lp_fwd = enc_a(params, jax.random.PRNGKey(4))
    lp_inv = jax.jit(lambda p, zz: flow_vae.encoder_log_prob(p, zz, x, m, cfg))(
        params, z)
    np.testing.assert_allclose(np.asarray(lp_fwd), np.asarray(lp_inv),
                               rtol=1e-4, atol=1e-5)

    # and the family trains end-to-end with the flag on
    model = get_model(cfg)
    loss, _ = jax.jit(
        lambda p, k: model.train_loss(p, x, m, m, k, jnp.float32(1.0), cfg)
    )(params, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))


def test_flow_actnorm_flag_checkpoint_mismatch_raises():
    """A flow_actnorm flag that disagrees with the checkpoint's structure is
    a hard error in BOTH directions (silently running the other stack would
    mislabel results relative to the config)."""
    import jax
    import pytest

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.models import flow_vae

    cfg_on = RunConfig(vae_type="vanilla_flow1", latent_dim=4, hid_dim=16,
                       flow_actnorm=True, flow_tails="linear")
    cfg_off = cfg_on.replace(flow_actnorm=False)
    p_on = flow_vae.init(jax.random.PRNGKey(0), cfg_on, 6)
    p_off = {k: v for k, v in p_on.items() if k != "actnorm"}
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 6))
    m = (jax.random.uniform(jax.random.PRNGKey(2), (4, 6)) < 0.7).astype(
        x.dtype)

    with pytest.raises(ValueError, match="ActNorm"):
        flow_vae.encode(p_off, x, m, jax.random.PRNGKey(3), cfg_on)
    with pytest.raises(ValueError, match="ActNorm"):
        flow_vae.encoder_log_prob(p_on, x[:, :4], x, m, cfg_off)
