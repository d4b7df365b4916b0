"""Gaussian-posterior VAE family: plain / mask-augmented / EDDI-PointNet encoders,
sigmoid decoder with fixed observation variance, ELBO + posterior-consistency
regularizers.

Covers the behavior of 8 reference classes with one parameterized implementation:
  Reg_VAE            (reference: src/models/VAE.py:350-507)
  Reg_VAE_mask       (reference: src/models/VAE.py:510-667)
  Reg_EDDI           (reference: src/models/VAE.py:670-853)
  Reg_EDDI_mnist     (reference: src/models/VAE.py:10-201)
  vanilla_VAE        (reference: src/models/VAE.py:1119-1240)
  vanilla_VAE_mask   (reference: src/models/VAE.py:995-1116)
  vanilla_EDDI       (reference: src/models/VAE.py:856-992)
  vanilla_EDDI_mnist (reference: src/models/VAE.py:204-347)

Loss parity notes (canonical form at reference VAE.py:92-162):
- The reconstruction term multiplies targets, means AND the (constant) logvar by
  the mask before the Gaussian log-prob, exactly as the reference does — masked
  cells therefore contribute the constant -log N(0|0,1) each, which keeps saved
  ELBO artifacts bit-comparable.
- `kl_reg`:  loss = loss_q + alpha*(KL(q||p) - loss_q + loss_p + RE_q[mask&~mask_p])
  (reference: VAE.py:441-446).
- `ml_reg`:  loss = loss_q - (epoch/2800)*alpha*log N(z_q; mu_p, sigma_p) with a
  fresh z_q sample (reference: VAE.py:435-440); the annealing constant is the
  hard-coded max_epoch=2800 (reference: VAE.py:384), independent of the config
  epoch count.
- beta-annealing scales KL by epoch/2800 (reference: VAE.py:429-431).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vae_posterior_consistency_tpu.models import layers
from vae_posterior_consistency_tpu.ops.fused_posterior import fused_posterior_auto
from vae_posterior_consistency_tpu.ops.math import (
    FIXED_X_LOGVAR,
    kl_diag_std,
    neg_gaussian_log_likelihood,
    reparameterize,
)

#: annealing denominator hard-coded by the reference (src/models/VAE.py:58,384)
MAX_EPOCH_ANNEAL = 2800.0


def _is_pointnet(cfg) -> bool:
    """The single pointnet-dispatch rule (EDDI/mnist families use the
    per-feature embedding encoder; reference substring precedence,
    models/registry.parse_vae_type). Shared by _encoder_fns and
    train_loss's 2-mask fast path — keep them routing identically."""
    return "EDDI" in cfg.vae_type or "mnist" in cfg.vae_type


def _encoder_fns(cfg):
    info = cfg.info
    mnist = cfg.data_type == "mnist"
    if _is_pointnet(cfg):
        trunk = (500, 500, 200) if mnist else (100, 50)

        def init(key, obs_dim):
            return layers.pointnet_encoder_init(
                key, obs_dim, cfg.latent_dim, cfg.K, trunk_widths=trunk
            )

        return init, layers.pointnet_encoder_apply
    if info.mask_augmented:
        def init(key, obs_dim):
            return layers.dense_mask_encoder_init(key, obs_dim, cfg.latent_dim)

        return init, layers.dense_mask_encoder_apply

    def init(key, obs_dim):
        return layers.dense_encoder_init(key, obs_dim, cfg.latent_dim)

    return init, layers.dense_encoder_apply


def _decoder_widths(cfg):
    return (200, 500, 500) if cfg.data_type == "mnist" else (50, 100)


def init(key, cfg, obs_dim):
    k_enc, k_dec = jax.random.split(key)
    enc_init, _ = _encoder_fns(cfg)
    return {
        "encoder": enc_init(k_enc, obs_dim),
        "decoder": layers.sigmoid_decoder_init(
            k_dec, obs_dim, cfg.latent_dim, widths=_decoder_widths(cfg)
        ),
    }


def encode(params, x, mask, cfg):
    """(mean, logvar) of q(z | x, mask) — also the AL information-reward hook
    (reference: src/experiment_main/evaluate.py:562-583 uses encoder stats only)."""
    _, enc_apply = _encoder_fns(cfg)
    return enc_apply(params["encoder"], x, mask)


def decode(params, z):
    """Sigmoid mean + fixed observation logvar (reference: VAE.py:397-401, 379)."""
    x_mean = layers.sigmoid_decoder_apply(params["decoder"], z)
    return x_mean, jnp.full_like(x_mean, FIXED_X_LOGVAR)


def forward(params, x, mask, key, cfg):
    mean, logvar = encode(params, x, mask, cfg)
    z = reparameterize(key, mean, logvar)
    x_mean, x_logvar = decode(params, z)
    return {"mean": mean, "logvar": logvar, "z": z, "x_mean": x_mean,
            "x_logvar": x_logvar}


#: closed-form constants for the fixed observation variance
_INV_VAR = math.exp(-FIXED_X_LOGVAR)
_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def _masked_re(x, x_mean, _x_logvar_ignored, m, axis=None):
    """Reconstruction NLL with the reference's mask-everything convention
    (reference: VAE.py:422-426).

    This family's observation logvar is ALWAYS the fixed constant
    FIXED_X_LOGVAR (decode(); reference VAE.py:379), and every mask here is
    binary, so the generic form
        -log N(x*m; mean*m, exp(logvar*m))
    folds to the closed form
        m * (0.5*e^{-c}*(x-mean)^2 + 0.5*c) + log sqrt(2pi)
    — exact-math identical (m^2 = m), but it removes the per-cell
    exp(logvar*m) transcendental over the [2B, obs_dim] grid from both the
    forward and backward passes (three RE terms per regularized step). The
    The logvar argument is kept for signature parity and IGNORED (named
    `_x_logvar_ignored` so a future non-fixed-logvar decoder variant cannot
    silently inherit the folded constant — use the generic NLL instead)."""
    del _x_logvar_ignored
    per_cell = m * (0.5 * _INV_VAR * jnp.square(x - x_mean)
                    + 0.5 * FIXED_X_LOGVAR) + _LOG_SQRT_2PI
    return jnp.sum(per_cell, axis=axis)


def _anneal(epoch, on):
    return jnp.where(on, epoch / MAX_EPOCH_ANNEAL, 1.0)


def train_loss(params, x, mask, mask_p, key, epoch, cfg):
    """Per-batch training loss (stage='train' path of reference VAE.py:403-452).

    For vanilla (non-reg) types `mask_p` is ignored and the plain ELBO is used
    (reference: VAE.py:1171-1196).

    TPU optimization: for regularized types the q- and p-branches share weights,
    so both encoder/decoder passes run as ONE [2B, ...] matmul stream (the
    reference runs them as two sequential forwards, VAE.py:502-506) — halves
    the number of kernel launches per step."""
    B = x.shape[0]
    info = cfg.info
    # kp is intentionally unused: the batched [2B] q/p forward draws both
    # branches' eps from kq; it is kept in the split so the established key
    # stream (pinned by tests/test_golden.py) stays stable
    kq, kp, kz = jax.random.split(key, 3)
    del kp
    beta_scale = _anneal(epoch, cfg.beta_annealing) * cfg.beta

    if not info.regularized:
        out_q = forward(params, x, mask, kq, cfg)
        RE_q = _masked_re(x, out_q["x_mean"], out_q["x_logvar"], mask)
        KL_q = kl_diag_std(out_q["mean"], out_q["logvar"])
        loss_q = RE_q + beta_scale * KL_q
        loss = loss_q / B
        return loss, {"RE_q": RE_q / B, "KL_q": KL_q / B}

    # one encoder pass for both branches. EDDI/pointnet families share the
    # mask-independent [B, D, K] embedding between the branches
    # (layers.pointnet_encoder_apply_2masks — the embed backward was 25% of
    # the profiled MNIST training step); dense families run the [2B] stream.
    if _is_pointnet(cfg):
        mean_all, logvar_all = layers.pointnet_encoder_apply_2masks(
            params["encoder"], x, mask, mask_p)  # [2, B, L]
        mean_q, mean_p = mean_all[0], mean_all[1]
        logvar_q, logvar_p = logvar_all[0], logvar_all[1]
        # same PRNG stream as the [2B, L] layout (row-major flatten agrees)
        eps = jax.random.normal(kq, mean_all.shape)
        eps_q, eps_p = eps[0], eps[1]
    else:
        mean_all, logvar_all = encode(
            params,
            jnp.concatenate([x, x], axis=0),
            jnp.concatenate([mask, mask_p], axis=0),
            cfg,
        )
        mean_q, mean_p = mean_all[:B], mean_all[B:]
        logvar_q, logvar_p = logvar_all[:B], logvar_all[B:]
        eps = jax.random.normal(kq, mean_all.shape)
        eps_q, eps_p = eps[:B], eps[B:]

    # fused reparameterize + KL(q||N(0,I)) + KL(p||N(0,I)) + KL(q||p)
    # (Pallas on TPU; identical-math jnp path elsewhere)
    z_q, z_p, KL_q, KL_p, KL_reg = fused_posterior_auto(
        mean_q, logvar_q, mean_p, logvar_p, eps_q, eps_p
    )
    x_mean_all, x_logvar_all = decode(params,
                                      jnp.concatenate([z_q, z_p], axis=0))
    xm_q, xm_p = x_mean_all[:B], x_mean_all[B:]
    xlv_q, xlv_p = x_logvar_all[:B], x_logvar_all[B:]

    RE_q = _masked_re(x, xm_q, xlv_q, mask)
    loss_q = RE_q + beta_scale * KL_q
    RE_p = _masked_re(x, xm_p, xlv_p, mask_p)
    loss_p = RE_p + beta_scale * KL_p

    if cfg.reg_type == "ml_reg":
        z_q2 = reparameterize(kz, mean_q, logvar_q)
        z_loglike = -neg_gaussian_log_likelihood(z_q2, mean_p, logvar_p)
        loss = loss_q - (epoch / MAX_EPOCH_ANNEAL) * cfg.alpha * z_loglike
    elif cfg.reg_type == "kl_reg":
        extra_mask = mask * (1.0 - mask_p)
        RE_extra = _masked_re(x, xm_q, xlv_q, extra_mask)
        loss = loss_q + cfg.alpha * (KL_reg - loss_q + loss_p + RE_extra)
    else:
        raise NotImplementedError(f"reg_type={cfg.reg_type!r}")
    loss = loss / B
    return loss, {"RE_q": RE_q / B, "KL_q": KL_q / B, "RE_p": RE_p / B,
                  "KL_p": KL_p / B}


def eval_step(params, x, mask, mask_p, key, cfg, epoch=None):
    """stage='evaluate' + llh_eval=True semantics (reference: VAE.py:410-420,
    455-456), in per-row form: the reference's batch scalars are the row-means
    (its sums divided by batch size), so `mean(row_*)` reproduces them exactly
    while letting the engine weight out padded rows."""
    epoch = cfg.epoch if epoch is None else epoch
    out_q = forward(params, x, mask, key, cfg)
    row_re = _masked_re(x, out_q["x_mean"], out_q["x_logvar"], mask, axis=-1)
    row_re_imp = _masked_re(x, out_q["x_mean"], out_q["x_logvar"], 1.0 - mask,
                            axis=-1)
    row_kl = kl_diag_std(out_q["mean"], out_q["logvar"], axis=-1)
    beta_scale = _anneal(jnp.asarray(epoch, jnp.float32), cfg.beta_annealing) * cfg.beta
    return {
        "x_imputed": out_q["x_mean"],
        "row_loss": row_re + beta_scale * row_kl,
        "row_negl": row_re,
        "row_negl_imp": row_re_imp,
    }
