"""Numerical parity of the math substrate against torch.distributions — the
exact implementations the reference relies on (src/models/VAE.py:164-185,
3073-3076; src/utils/utils.py:129-161)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vae_posterior_consistency_tpu.ops import math as M

RNG = np.random.default_rng(0)


def _rand(shape, lo=-2, hi=2):
    return RNG.uniform(lo, hi, shape).astype(np.float32)


def test_normal_logpdf_matches_torch():
    x, mu, lv = _rand((5, 4)), _rand((5, 4)), _rand((5, 4))
    ours = np.asarray(M.normal_logpdf(jnp.asarray(x), jnp.asarray(mu),
                                      jnp.asarray(lv)))
    ref = (
        torch.distributions.Normal(torch.tensor(mu),
                                   torch.exp(torch.tensor(lv) / 2))
        .log_prob(torch.tensor(x))
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_kl_diag_std_matches_torch():
    mu, lv = _rand((6, 3)), _rand((6, 3))
    ours = float(M.kl_diag_std(jnp.asarray(mu), jnp.asarray(lv)))
    prior = torch.distributions.Normal(torch.zeros(3), torch.ones(3))
    dist = torch.distributions.Normal(torch.tensor(mu),
                                      torch.exp(torch.tensor(lv) / 2))
    ref = float(torch.distributions.kl_divergence(dist, prior).sum())
    assert abs(ours - ref) < 5e-4


def test_kl_diag_diag_matches_torch():
    m1, l1, m2, l2 = (_rand((4, 5)) for _ in range(4))
    ours = float(M.kl_diag_diag(*map(jnp.asarray, (m1, l1, m2, l2))))
    d1 = torch.distributions.Normal(torch.tensor(m1), torch.exp(torch.tensor(l1) / 2))
    d2 = torch.distributions.Normal(torch.tensor(m2), torch.exp(torch.tensor(l2) / 2))
    ref = float(torch.distributions.kl_divergence(d1, d2).sum())
    assert abs(ours - ref) < 5e-4


def test_student_t_matches_torch():
    x = _rand((8, 3))
    loc = _rand((8, 3))
    scale = np.abs(_rand((8, 3))) + 0.1
    df = np.abs(_rand((8, 3))) + 3.0
    ours = np.asarray(
        M.student_t_logpdf(*map(jnp.asarray, (x, loc, scale, df)))
    )
    ref = (
        torch.distributions.StudentT(
            df=torch.tensor(df), loc=torch.tensor(loc), scale=torch.tensor(scale)
        )
        .log_prob(torch.tensor(x))
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_bernoulli_logits_matches_torch():
    logits = _rand((6, 4), -5, 5)
    target = (RNG.random((6, 4)) < 0.5).astype(np.float32)
    ours = np.asarray(
        M.bernoulli_logits_logpmf(jnp.asarray(logits), jnp.asarray(target))
    )
    ref = (
        torch.distributions.Bernoulli(logits=torch.tensor(logits))
        .log_prob(torch.tensor(target))
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_log_mean_exp():
    x = _rand((5, 7))
    ours = np.asarray(M.log_mean_exp(jnp.asarray(x), axis=-1))
    ref = np.log(np.mean(np.exp(x), axis=-1))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_masked_rmse():
    x = _rand((10, 4))
    xh = _rand((10, 4))
    hole = (RNG.random((10, 4)) < 0.4).astype(np.float32)
    ours = float(M.masked_rmse(jnp.asarray(xh), jnp.asarray(x), jnp.asarray(hole)))
    diff = (xh - x) * hole
    ref = np.sqrt((diff**2).sum() / hole.sum())
    assert abs(ours - ref) < 1e-5


def test_fixed_x_logvar_value():
    # log((0.1*sqrt(2))^2) — reference: src/models/VAE.py:379
    assert abs(M.FIXED_X_LOGVAR - float(np.log((0.1 * np.sqrt(2)) ** 2))) < 1e-12


@pytest.mark.parametrize("how", ["minmax", "stand"])
def test_normalizations(how):
    x = _rand((50, 3))
    if how == "minmax":
        out = np.asarray(M.minmax_normalize(jnp.asarray(x)))
        assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6
    else:
        out = np.asarray(M.standardize(jnp.asarray(x)))
        np.testing.assert_allclose(out.mean(0), 0, atol=1e-5)
        np.testing.assert_allclose(out.std(0, ddof=1), 1, atol=1e-4)


def test_check_interval():
    # reference: src/utils/utils.py:8-15 (scalar -> 1-element BoolTensor)
    assert bool(M.check(0.5, 0.0, 1.0))
    assert bool(M.check(0.0, 0.0, 1.0)) and bool(M.check(1.0, 0.0, 1.0))
    assert not bool(M.check(-0.1, 0.0, 1.0))
    assert not bool(M.check(1.1, 0.0, 1.0))
    # elementwise form (vectorizes; works under jit)
    out = np.asarray(M.check(jnp.asarray([-1.0, 0.5, 2.0]), 0.0, 1.0))
    np.testing.assert_array_equal(out, [False, True, False])
