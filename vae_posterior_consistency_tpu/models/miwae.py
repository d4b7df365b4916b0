"""MIWAE family: Student-t decoder likelihood, importance-weighted bound.

Covers:
  MIWAE     (reference: src/models/VAE.py:3011-3134)
  Reg_MIWAE (reference: src/models/VAE.py:3137-3301)

TPU-first: importance samples live on a broadcast axis [B, K, ...] produced from
one encoder pass (the reference materializes them with `.unsqueeze(0).expand(...)
.permute(...)`, VAE.py:3050-3053); the decoder runs as one batched [B*K, L]
matmul; the bound is a single logsumexp over the sample axis.

Deliberate deviations from reference quirks (documented intent, SURVEY.md §7):
- One z sample is used for BOTH the decoder outputs and the importance weights.
  The reference draws a *fresh* z inside `loss` for log p(z) - log q(z)
  (VAE.py:3086-3091) while log p(x|z) uses the forward-pass z, which decorrelates
  the weight terms.
- The [B,K] sample/batch axes stay aligned end-to-end. The reference's
  `reshape([num_samples * B, obs_dim]) ... reshape([num_samples, B])` round-trip
  (VAE.py:3078-3081) silently transposes/scrambles the axes whenever K != B.
- As in the reference, the bound omits the -log K normalizer
  (VAE.py:3092) — kept for artifact parity (constant offset).

Layout note (round-2 measurement): a hand-written K-last ([B, D, K]) variant
of the whole sample path — motivated by the (8,128) tile padding a [B, K, D]
D~12 tabular layout implies — measured only +7% at batch 64 / +1% at batch
512 for eval at K=5000 on v5e (tools/bench_scaling.py:miwae_eval_rate, 45k ->
48k and 55k -> 56k rows/s). XLA's own layout assignment already handles the
minor-dim choice; the step is VPU-bound on the Student-t transcendentals
(two gammaln per element), not on padded bandwidth. The variant was therefore
dropped — same verdict as the Pallas posterior kernel (ops/fused_posterior.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vae_posterior_consistency_tpu.models import layers
from vae_posterior_consistency_tpu.ops.math import (
    kl_diag_diag_scale_elems,
    normal_logpdf,
    normal_logpdf_scale,
    student_t_logpdf,
)


def init(key, cfg, obs_dim):
    k_enc, k_dec = jax.random.split(key)
    return {
        "encoder": layers.miwae_encoder_init(k_enc, obs_dim, cfg.latent_dim),
        "decoder": layers.student_t_decoder_init(k_dec, obs_dim, cfg.latent_dim),
    }


def encode(params, x, mask, cfg):
    """(mean, scale) of q(z|x,mask); scale is a softplus std
    (reference: VAE.py:3047-3059)."""
    return layers.miwae_encoder_apply(params["encoder"], x, mask)


def forward(params, x, mask, key, cfg, num_samples):
    """K importance samples; returns dict with [B,K,...] tensors."""
    mean, scale = encode(params, x, mask, cfg)
    B, L = mean.shape
    eps = jax.random.normal(key, (B, num_samples, L))
    z = mean[:, None, :] + scale[:, None, :] * eps
    x_mean, x_scale, df = layers.student_t_decoder_apply(params["decoder"], z)
    return {"mean": mean, "scale": scale, "z": z, "x_mean": x_mean,
            "x_scale": x_scale, "df": df}


def _branch_terms(out, x, mask):
    """(logpxobs [B,K], log_w [B,K], logpx_imp [B,K]) for one encoder branch
    (reference bound terms: VAE.py:3073-3092)."""
    log_pxz = student_t_logpdf(x[:, None, :], out["x_mean"], out["x_scale"],
                               out["df"])  # [B,K,D]
    logpxobs = jnp.sum(log_pxz * mask[:, None, :], axis=-1)
    logpx_imp = jnp.sum(log_pxz * (1.0 - mask[:, None, :]), axis=-1)
    logpz = jnp.sum(
        normal_logpdf(out["z"], jnp.zeros_like(out["z"]), jnp.zeros_like(out["z"])),
        axis=-1,
    )
    logq = jnp.sum(
        normal_logpdf_scale(out["z"], out["mean"][:, None, :],
                            out["scale"][:, None, :]),
        axis=-1,
    )
    return logpxobs, logpxobs + logpz - logq, logpx_imp, log_pxz


def _neg_bound(log_w):
    """-mean_B(logsumexp_K(log_w)) — no -log K, as the reference
    (VAE.py:3092)."""
    return -jnp.mean(jax.scipy.special.logsumexp(log_w, axis=1))


def train_loss(params, x, mask, mask_p, key, epoch, cfg, num_samples=None):
    """IWAE negative bound; for reg_MIWAE the consistency composite
    (reference: VAE.py:3197-3251)."""
    K = num_samples or cfg.train_k
    info = cfg.info
    kq, kp = jax.random.split(key)

    out_q = forward(params, x, mask, kq, cfg, K)
    _, log_w_q, _, log_pxz_q = _branch_terms(out_q, x, mask)
    neg_bound_q = _neg_bound(log_w_q)

    if not info.regularized:
        return neg_bound_q, {"neg_bound": neg_bound_q}

    out_p = forward(params, x, mask_p, kp, cfg, K)
    _, log_w_p, _, _ = _branch_terms(out_p, x, mask_p)
    neg_bound_p = _neg_bound(log_w_p)

    # extra likelihood reward on the cells hidden from the p-branch
    # (reference: VAE.py:3244-3246)
    extra = (mask * (1.0 - mask_p))[:, None, :]
    reg_like = jnp.mean(jnp.sum(log_pxz_q * extra, axis=-1))
    KL_reg = jnp.mean(
        kl_diag_diag_scale_elems(out_q["mean"], out_q["scale"], out_p["mean"],
                           out_p["scale"])
    )
    loss = neg_bound_q + cfg.alpha * (KL_reg - neg_bound_q + neg_bound_p - reg_like)
    return loss, {"neg_bound_q": neg_bound_q, "neg_bound_p": neg_bound_p,
                  "KL_reg": KL_reg}


def eval_step(params, x, mask, mask_p, key, cfg, num_samples=None):
    """llh_eval semantics (reference: VAE.py:3095-3099, 3254-3258), per-row:
    importance-weighted imputation xm = sum_k w_k x_mean_k, plus the bound.
    `mean(row_*)` equals the reference batch scalars."""
    K = num_samples or cfg.valid_k
    info = cfg.info
    kq, kp = jax.random.split(key)

    out_q = forward(params, x, mask, kq, cfg, K)
    _, log_w_q, logpx_imp, log_pxz_q = _branch_terms(out_q, x, mask)
    row_neg_bound_q = -jax.scipy.special.logsumexp(log_w_q, axis=1)
    w = jax.nn.softmax(log_w_q, axis=1)  # [B,K]
    xm = jnp.einsum("bk,bkd->bd", w, out_q["x_mean"])

    if not info.regularized:
        # reference divides by the hard-coded 5000 (VAE.py:3099)
        row_negl = jnp.sum(logpx_imp, axis=1) / 5000.0
        return {"x_imputed": xm, "row_loss": row_neg_bound_q,
                "row_negl": row_negl, "row_negl_imp": row_negl}

    out_p = forward(params, x, mask_p, kp, cfg, K)
    _, log_w_p, _, _ = _branch_terms(out_p, x, mask_p)
    row_neg_bound_p = -jax.scipy.special.logsumexp(log_w_p, axis=1)
    extra = (mask * (1.0 - mask_p))[:, None, :]
    row_reg_like = jnp.mean(jnp.sum(log_pxz_q * extra, axis=-1), axis=1)
    row_kl_reg = jnp.mean(
        kl_diag_diag_scale_elems(out_q["mean"], out_q["scale"], out_p["mean"],
                           out_p["scale"]),
        axis=-1,
    )
    row_loss = row_neg_bound_q + cfg.alpha * (
        row_kl_reg - row_neg_bound_q + row_neg_bound_p - row_reg_like
    )
    return {"x_imputed": xm, "row_loss": row_loss, "row_negl": row_loss,
            "row_negl_imp": row_loss}
