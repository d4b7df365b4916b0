"""Per-family loss math: hand-computed parity vs a torch re-derivation of the
reference loss formulas on small tensors (SURVEY.md §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.models import gauss, get_model
from vae_posterior_consistency_tpu.ops.math import FIXED_X_LOGVAR

ALL_TYPES = [
    "reg_vae1", "reg_vae1_mask_augm", "vanilla_vae1", "vanilla_vae1_mask_augm",
    "reg_EDDI1", "vanilla_EDDI1", "reg_flow1", "vanilla_flow1",
    "reg_MIWAE1", "vanilla_MIWAE1", "reg_notMIWAE1", "vanilla_notMIWAE1",
]


@pytest.mark.parametrize("vae_type", ALL_TYPES)
def test_loss_grad_and_eval(vae_type, batch):
    """One jitted drive per family: finite differentiable loss + well-shaped
    per-row eval outputs."""
    x, mask, mask_p = batch
    cfg = RunConfig(vae_type=vae_type, train_k=3, valid_k=4, M=1)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0), cfg, x.shape[1])

    @jax.jit
    def drive(p):
        loss, grads = jax.value_and_grad(
            lambda q: model.train_loss(q, x, mask, mask_p, jax.random.PRNGKey(1),
                                       jnp.float32(5.0), cfg)[0]
        )(p)
        ev = model.eval_step(p, x, mask, mask_p, jax.random.PRNGKey(2), cfg)
        return loss, grads, ev

    loss, grads, out = drive(params)
    assert bool(jnp.isfinite(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # at least one parameter receives gradient signal
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
    assert out["x_imputed"].shape == x.shape
    for k in ("row_loss", "row_negl", "row_negl_imp"):
        assert out[k].shape == (x.shape[0],)
        assert bool(jnp.all(jnp.isfinite(out[k])))


def _torch_gauss_ref_loss(x, mask, mask_p, mean_q, logvar_q, xm_q, mean_p,
                          logvar_p, xm_p, alpha, reg_type, epoch):
    """Torch re-derivation of the reference Reg_VAE kl_reg loss
    (src/models/VAE.py:403-452), given fixed forward outputs."""
    x, mask, mask_p = map(torch.tensor, (x, mask, mask_p))
    mean_q, logvar_q, xm_q = map(torch.tensor, (mean_q, logvar_q, xm_q))
    mean_p, logvar_p, xm_p = map(torch.tensor, (mean_p, logvar_p, xm_p))
    xlv = torch.ones_like(xm_q) * FIXED_X_LOGVAR

    def negll(t, m, lv):
        d = torch.distributions.Normal(m, torch.exp(lv / 2.0))
        return torch.sum(-d.log_prob(t))

    def klstd(m, lv):
        d = torch.distributions.Normal(m, torch.exp(lv / 2.0))
        p = torch.distributions.Normal(torch.zeros_like(m), torch.ones_like(m))
        return torch.sum(torch.distributions.kl_divergence(d, p))

    RE_q = negll(x * mask, xm_q * mask, xlv * mask)
    RE_p = negll(x * mask_p, xm_p * mask_p, xlv * mask_p)
    KL_q = klstd(mean_q, logvar_q)
    KL_p = klstd(mean_p, logvar_p)
    loss_q = RE_q + KL_q
    loss_p = RE_p + KL_p
    d1 = torch.distributions.Normal(mean_q, torch.exp(logvar_q / 2))
    d2 = torch.distributions.Normal(mean_p, torch.exp(logvar_p / 2))
    KL_reg = torch.sum(torch.distributions.kl_divergence(d1, d2))
    extra = mask * (1 - mask_p)
    RE_extra = negll(x * extra, xm_q * extra, xlv * extra)
    loss = loss_q + alpha * (KL_reg - loss_q + loss_p + RE_extra)
    return float(loss / x.shape[0])


def test_reg_vae_klreg_loss_matches_reference_formula():
    """Drive the same forward outputs through our loss and a torch
    re-derivation of the reference formula; they must agree."""
    rng = np.random.default_rng(0)
    B, D, L = 6, 5, 3
    cfg = RunConfig(vae_type="reg_vae1", latent_dim=L, alpha=0.7,
                    reg_type="kl_reg")
    x = rng.uniform(0, 1, (B, D)).astype(np.float32)
    mask = (rng.random((B, D)) < 0.7).astype(np.float32)
    mask_p = mask * (rng.random((B, D)) < 0.7).astype(np.float32)

    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0), cfg, D)

    # recompute the deterministic parts of the forward pass ourselves
    mean_q, logvar_q = gauss.encode(params, jnp.asarray(x), jnp.asarray(mask),
                                    cfg)
    mean_p, logvar_p = gauss.encode(params, jnp.asarray(x), jnp.asarray(mask_p),
                                    cfg)

    # our loss draws z stochastically; the decoder mean depends on z. To make
    # the comparison exact we replicate the loss's draw pattern: one eps tensor
    # of shape [2B, L] from the first split of the loss key.
    key = jax.random.PRNGKey(7)
    kq, kp, _ = jax.random.split(key, 3)
    eps = jax.random.normal(kq, (2 * B, L))
    z_q = mean_q + eps[:B] * jnp.exp(0.5 * logvar_q)
    z_p = mean_p + eps[B:] * jnp.exp(0.5 * logvar_p)
    xm_q, _ = gauss.decode(params, z_q)
    xm_p, _ = gauss.decode(params, z_p)

    ours, _ = gauss.train_loss(params, jnp.asarray(x), jnp.asarray(mask),
                               jnp.asarray(mask_p), key, jnp.float32(10.0), cfg)
    ref = _torch_gauss_ref_loss(
        x, mask, mask_p,
        *map(np.asarray, (mean_q, logvar_q, xm_q)),
        *map(np.asarray, (mean_p, logvar_p, xm_p)),
        cfg.alpha, cfg.reg_type, 10.0,
    )
    assert abs(float(ours) - ref) < 1e-3


def test_vanilla_vae_elbo_matches_reference_formula():
    rng = np.random.default_rng(1)
    B, D, L = 5, 4, 3
    cfg = RunConfig(vae_type="vanilla_vae1", latent_dim=L)
    x = rng.uniform(0, 1, (B, D)).astype(np.float32)
    mask = (rng.random((B, D)) < 0.7).astype(np.float32)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(3), cfg, D)

    key = jax.random.PRNGKey(9)
    kq, _, _ = jax.random.split(key, 3)
    mean_q, logvar_q = gauss.encode(params, jnp.asarray(x), jnp.asarray(mask),
                                    cfg)
    from vae_posterior_consistency_tpu.ops.math import reparameterize

    z_q = reparameterize(kq, mean_q, logvar_q)
    xm_q, _ = gauss.decode(params, z_q)

    ours, _ = gauss.train_loss(params, jnp.asarray(x), jnp.asarray(mask),
                               jnp.ones_like(jnp.asarray(mask)), key,
                               jnp.float32(10.0), cfg)

    xlv = torch.ones(B, D) * FIXED_X_LOGVAR
    xt, mt = torch.tensor(x), torch.tensor(mask)
    d = torch.distributions.Normal(torch.tensor(np.asarray(xm_q)) * mt,
                                   torch.exp(xlv * mt / 2))
    RE = float(torch.sum(-d.log_prob(xt * mt)))
    dq = torch.distributions.Normal(torch.tensor(np.asarray(mean_q)),
                                    torch.exp(torch.tensor(np.asarray(logvar_q)) / 2))
    pr = torch.distributions.Normal(torch.zeros(L), torch.ones(L))
    KL = float(torch.sum(torch.distributions.kl_divergence(dq, pr)))
    assert abs(float(ours) - (RE + KL) / B) < 1e-3


def test_pointnet_encoder_mask_invariance():
    """EDDI sum-pool: hidden features must not affect the embedding — changing
    x at masked-out positions must leave the encoder output unchanged
    (the defining property of the masked PointNet, reference VAE.py:719-741)."""
    cfg = RunConfig(vae_type="vanilla_EDDI1", K=4, latent_dim=3)
    model = get_model(cfg)
    D = 6
    params = model.init(jax.random.PRNGKey(0), cfg, D)
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, D))
    mask = jnp.asarray([[1, 1, 0, 0, 1, 0]] * 3, jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(2), (3, D)) * (1 - mask)
    m1, l1 = gauss.encode(params, x, mask, cfg)
    m2, l2 = gauss.encode(params, x + noise, mask, cfg)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_notmiwae_imputation_weights_normalize(batch):
    x, mask, mask_p = batch
    cfg = RunConfig(vae_type="vanilla_notMIWAE1", train_k=8, valid_k=8)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0), cfg, x.shape[1])
    out = model.eval_step(params, x, mask, mask_p, jax.random.PRNGKey(1), cfg)
    # imputation is a convex combination of per-sample decoder means in [0,1]
    assert float(out["x_imputed"].min()) >= 0.0
    assert float(out["x_imputed"].max()) <= 1.0
