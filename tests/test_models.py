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


# ---------------------------------------------------------------------------
# Non-default variant coverage (VERDICT r1 item 4): ml_reg, notMIWAE 'author',
# REG_notMIWAE 'both_s', REG_notMIWAE_new_version 'sampled_mask'
# ---------------------------------------------------------------------------


def test_ml_reg_composite_is_linear_in_epoch(batch):
    """ml_reg: loss = loss_q - (epoch/2800) * alpha * log N(z_q; mu_p, sig_p)
    (reference: VAE.py:133-138). With beta_annealing off, loss_q is
    epoch-independent, so the composite must be exactly linear in epoch and
    hit loss_q at epoch=0."""
    x, mask, mask_p = batch
    cfg = RunConfig(vae_type="reg_vae1", reg_type="ml_reg", alpha=2.0,
                    latent_dim=4)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0), cfg, x.shape[1])
    key = jax.random.PRNGKey(1)

    def loss_at(epoch):
        return float(model.train_loss(params, x, mask, mask_p, key,
                                      jnp.float32(epoch), cfg)[0])

    l0, l1400, l2800 = loss_at(0.0), loss_at(1400.0), loss_at(2800.0)
    # linear in epoch: midpoint exactly between endpoints
    assert abs(l1400 - 0.5 * (l0 + l2800)) < 1e-4
    # epoch=0 kills the reg term -> plain loss_q (== vanilla ELBO loss on the
    # same params/key: the q-branch ignores mask_p)
    assert l2800 != l0  # the reg term is actually live
    # and alpha scales the reg term linearly too
    cfg_a1 = cfg.replace(alpha=1.0)
    l2800_a1 = float(model.train_loss(params, x, mask, mask_p, key,
                                      jnp.float32(2800.0), cfg_a1)[0])
    assert abs((l2800 - l0) - 2.0 * (l2800_a1 - l0)) < 1e-4


def test_reg_notmiwae_variants_reduce_to_q_bound_at_alpha0(batch):
    """All three reg-notMIWAE composites are loss_q + alpha*(...) (reference:
    VAE.py:2451-2455, 2634-2637, 2267-2273); at alpha=0 every variant must
    give the identical q-branch bound."""
    x, mask, mask_p = batch
    losses = {}
    for variant in ("v2", "both_s", "sampled_mask"):
        cfg = RunConfig(vae_type="reg_notMIWAE1", alpha=0.0, train_k=4,
                        latent_dim=3, reg_notmiwae_variant=variant)
        model = get_model(cfg)
        params = model.init(jax.random.PRNGKey(0), cfg, x.shape[1])
        losses[variant] = float(model.train_loss(
            params, x, mask, mask_p, jax.random.PRNGKey(1), jnp.float32(1.0),
            cfg)[0])
    assert losses["v2"] == pytest.approx(losses["both_s"], abs=1e-5)
    assert losses["v2"] == pytest.approx(losses["sampled_mask"], abs=1e-5)


def test_reg_notmiwae_variants_differ_at_alpha1(batch):
    """At alpha=1 the three composites are genuinely different objectives:
    both_s adds log p(s|x) to the p-branch weights (reference: VAE.py:2622),
    sampled_mask draws mask_p from the learned missingness model
    (VAE.py:2232-2239)."""
    x, mask, mask_p = batch
    losses = {}
    for variant in ("v2", "both_s", "sampled_mask"):
        cfg = RunConfig(vae_type="reg_notMIWAE1", alpha=1.0, train_k=4,
                        latent_dim=3, reg_notmiwae_variant=variant)
        model = get_model(cfg)
        params = model.init(jax.random.PRNGKey(0), cfg, x.shape[1])
        losses[variant] = float(model.train_loss(
            params, x, mask, mask_p, jax.random.PRNGKey(1), jnp.float32(1.0),
            cfg)[0])
    vals = list(losses.values())
    assert len({round(v, 5) for v in vals}) == 3, losses


def test_sampled_mask_variant_ignores_passed_mask_p(batch):
    """REG_notMIWAE_new_version samples mask_p inside the loss (reference:
    VAE.py:2232-2236): the engine-supplied mask_p must have NO effect, while
    for v2 it must."""
    x, mask, mask_p = batch
    other_mask_p = mask * (1.0 - mask_p)  # a very different sub-mask
    for variant, should_match in (("sampled_mask", True), ("v2", False)):
        cfg = RunConfig(vae_type="reg_notMIWAE1", alpha=1.0, train_k=4,
                        latent_dim=3, reg_notmiwae_variant=variant)
        model = get_model(cfg)
        params = model.init(jax.random.PRNGKey(0), cfg, x.shape[1])
        l1 = float(model.train_loss(params, x, mask, mask_p,
                                    jax.random.PRNGKey(1), jnp.float32(1.0),
                                    cfg)[0])
        l2 = float(model.train_loss(params, x, mask, other_mask_p,
                                    jax.random.PRNGKey(1), jnp.float32(1.0),
                                    cfg)[0])
        assert (l1 == l2) == should_match, (variant, l1, l2)


def test_notmiwae_author_variant_nets(batch):
    """Author-style notMIWAE (reference: VAE.py:2850-2928): Tanh trunk with
    hardtanh(-10,10)-clamped encoder logvar and a softplus-std decoder whose
    logvar = log(softplus(.)^2) — finite for any input; gradients flow."""
    x, mask, mask_p = batch
    from vae_posterior_consistency_tpu.models import notmiwae

    cfg = RunConfig(vae_type="vanilla_notMIWAE1", not_miwae_type="author",
                    train_k=4, latent_dim=3)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0), cfg, x.shape[1])
    # extreme inputs: encoder logvar stays clamped in [-10, 10]
    huge = x * 1e4
    mean, logvar = notmiwae.encode(params, huge, mask, cfg)
    assert float(jnp.max(logvar)) <= 10.0 + 1e-6
    assert float(jnp.min(logvar)) >= -10.0 - 1e-6
    out = notmiwae.forward(params, huge, mask, jax.random.PRNGKey(1), cfg, 4)
    assert bool(jnp.isfinite(out["x_logvar"]).all())
    loss, grads = jax.value_and_grad(
        lambda p: model.train_loss(p, x, mask, mask_p, jax.random.PRNGKey(2),
                                   jnp.float32(1.0), cfg)[0]
    )(params)
    assert np.isfinite(float(loss))
    assert all(bool(jnp.isfinite(g).all())
               for g in jax.tree_util.tree_leaves(grads))
    # and it is a different net family than 'changed' (different param tree
    # or different outputs for the same key)
    cfg_ch = cfg.replace(not_miwae_type="changed")
    params_ch = get_model(cfg_ch).init(jax.random.PRNGKey(0), cfg_ch,
                                       x.shape[1])
    l_ch = float(get_model(cfg_ch).train_loss(
        params_ch, x, mask, mask_p, jax.random.PRNGKey(2), jnp.float32(1.0),
        cfg_ch)[0])
    assert l_ch != float(loss)


def test_compute_dtype_bfloat16_trains_equivalently():
    """compute_dtype='bfloat16' (matmul operands + the EDDI embed chain in
    bf16, f32 accumulation/params) must track the f32 training trajectory
    within bf16 rounding — same shapes, same key streams, loss curves within
    a few percent."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.engine.train import _build_epoch_runner
    from vae_posterior_consistency_tpu.models import get_model

    rng = np.random.default_rng(5)
    data = jnp.asarray(rng.uniform(0, 1, (96, 20)), jnp.float32)
    mask = jnp.asarray(rng.random((96, 20)) < 0.7, jnp.float32)
    hist = {}
    for dt in ("float32", "bfloat16"):
        cfg = RunConfig(vae_type="reg_EDDI_mnist1", data_type="mnist",
                        reg_type="kl_reg", batch_size=32, latent_dim=4, K=6,
                        compute_dtype=dt)
        model = get_model(cfg)
        params = model.init(jax.random.PRNGKey(0), cfg, 20)
        runner = _build_epoch_runner(cfg, data, mask, model,
                                     template_params=params)
        _, _, losses = runner(params, runner.tx.init(params),
                              jax.random.PRNGKey(1), jnp.asarray(0), 15)
        hist[dt] = np.asarray(losses)
    assert np.isfinite(hist["bfloat16"]).all()
    # both trajectories decrease and stay within a few percent of each other
    assert hist["bfloat16"][-1] < hist["bfloat16"][0]
    np.testing.assert_allclose(hist["bfloat16"], hist["float32"], rtol=0.05)


def test_compute_dtype_misspelling_rejected():
    """'bf16' etc. must raise, not silently run f32 while claiming mixed
    precision (nn/core.dense tests the exact string 'bfloat16')."""
    import pytest

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.models import get_model

    cfg = RunConfig(vae_type="reg_vae1", compute_dtype="bf16")
    with pytest.raises(ValueError, match="compute_dtype"):
        get_model(cfg)
