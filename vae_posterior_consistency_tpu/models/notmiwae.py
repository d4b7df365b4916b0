"""notMIWAE family: MNAR models with a learned missingness process p(s|x).

Covers:
  notMIWAE_myversion        (reference: src/models/VAE.py:2691-2847) — 'changed'
  notMIWAE                  (reference: src/models/VAE.py:2850-3008) — 'author'
  REG_notMIWAE_v2           (reference: src/models/VAE.py:2327-2505) — the reg
      variant the factory actually instantiates (src/utils/loaders.py:89-103)
  REG_notMIWAE              (reference: src/models/VAE.py:2508-2688) — variant
      'both_s': both branches get log p(s|x) terms
  REG_notMIWAE_new_version  (reference: src/models/VAE.py:2132-2324) — variant
      'sampled_mask': mask_p is *sampled from the learned missingness model*

Missingness processes (reference: VAE.py:2778-2787):
  selfmasking:        logits = -W * (x_mixed - b)
  selfmasking_known:  logits = -softplus(W) * (x_mixed - b)   [default]
  linear:             logits = Linear(x_mixed)

Parity decisions:
- The reference's bound logsumexps the *positive* l_w = RE + KL - log p(s|x)
  (VAE.py:2803-2807) — not the standard IWAE bound (which would logsumexp the
  negated weights). This IS the objective that produced the reference's
  behavior, so it is kept by default; set RunConfig.fixed_iwae_bound=True for
  the textbook bound. Imputation weights are softmax(-l_w) in both cases
  (VAE.py:2811-2812), matching the reference.
- Deviation (documented intent): one z sample feeds both the decoder outputs and
  the KL term. The reference redraws z inside `loss` for log q - log p
  (VAE.py:2791-2798), decorrelating the weight terms.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vae_posterior_consistency_tpu.models import layers
from vae_posterior_consistency_tpu.nn import core
from vae_posterior_consistency_tpu.ops.math import (
    bernoulli_logits_logpmf,
    kl_diag_diag,
    normal_logpdf,
)


def _variant(cfg):
    return getattr(cfg, "not_miwae_type", "changed")


def init(key, cfg, obs_dim):
    k_enc, k_dec, k_w, k_b, k_lin = jax.random.split(key, 5)
    return {
        "encoder": layers.notmiwae_encoder_init(k_enc, obs_dim, cfg.latent_dim),
        "decoder": layers.notmiwae_decoder_init(k_dec, obs_dim, cfg.latent_dim),
        # missing-process params W, b: xavier_uniform on [1,1,D]
        # (reference: VAE.py:2735-2740)
        "W": core.xavier_uniform(k_w, (1, obs_dim))[None],
        "b": core.xavier_uniform(k_b, (1, obs_dim))[None],
        "logits_lin": core.torch_linear_init(k_lin, obs_dim, obs_dim),
    }


def encode(params, x, mask, cfg):
    """(mean, logvar) of q(z|x,mask) (reference: VAE.py:2748-2763)."""
    return layers.notmiwae_encoder_apply(params["encoder"], x, mask,
                                         variant=_variant(cfg))


def forward(params, x, mask, key, cfg, num_samples):
    mean, logvar = encode(params, x, mask, cfg)
    B, L = mean.shape
    eps = jax.random.normal(key, (B, num_samples, L))
    z = mean[:, None, :] + jnp.exp(0.5 * logvar)[:, None, :] * eps
    x_mean, x_logvar = layers.notmiwae_decoder_apply(params["decoder"], z,
                                                     variant=_variant(cfg))
    return {"mean": mean, "logvar": logvar, "z": z, "x_mean": x_mean,
            "x_logvar": x_logvar}


def missingness_logits(params, x_mixed, missing_process="selfmasking_known"):
    """Bernoulli logits of p(s|x) on the mixed (observed+reconstructed) data
    (reference: VAE.py:2778-2787)."""
    if missing_process == "selfmasking":
        return -params["W"] * (x_mixed - params["b"])
    if missing_process == "selfmasking_known":
        return -jax.nn.softplus(params["W"]) * (x_mixed - params["b"])
    return core.dense(params["logits_lin"], x_mixed)  # 'linear'


def _branch(params, out, x, mask, missing_process, with_s=True):
    """RE, KL, log p(s|x) and l_w for one branch, all [B,K]."""
    m = mask[:, None, :]
    new_x = x[:, None, :]
    x_mixed = out["x_mean"] * (1.0 - m) + new_x * m
    RE = -jnp.sum(
        normal_logpdf(new_x * m, out["x_mean"] * m, out["x_logvar"] * m), axis=-1
    )
    # KL = log q(z) - log p(z), Monte-Carlo with the decoder's z
    # (documented deviation; reference redraws z: VAE.py:2791-2798)
    logq = jnp.sum(
        normal_logpdf(out["z"], out["mean"][:, None, :],
                      out["logvar"][:, None, :]),
        axis=-1,
    )
    logp = jnp.sum(
        normal_logpdf(out["z"], jnp.zeros_like(out["z"]), jnp.zeros_like(out["z"])),
        axis=-1,
    )
    KL = logq - logp
    l_w = RE + KL
    log_p_s = jnp.zeros_like(RE)
    if with_s:
        logits = missingness_logits(params, x_mixed, missing_process)
        log_p_s = jnp.sum(
            bernoulli_logits_logpmf(logits, jnp.broadcast_to(m, logits.shape)),
            axis=-1,
        )
        l_w = l_w - log_p_s
    return RE, KL, log_p_s, l_w


def _bound(l_w, num_samples, fixed=False):
    """Reference objective: mean(logsumexp(l_w) - log K) over the batch
    (VAE.py:2805-2807). `fixed=True` gives the textbook notMIWAE bound."""
    sign = -1.0 if fixed else 1.0
    lse = jax.scipy.special.logsumexp(sign * l_w, axis=1) - math.log(num_samples)
    return jnp.mean(sign * lse)


def _impute(l_w, x_mean):
    """Self-normalized importance imputation (reference: VAE.py:2811-2812)."""
    w = jax.nn.softmax(-l_w, axis=1)
    return jnp.einsum("bk,bkd->bd", w, x_mean)


def train_loss(params, x, mask, mask_p, key, epoch, cfg, num_samples=None,
               missing_process="selfmasking_known"):
    K = num_samples or cfg.train_k
    fixed = getattr(cfg, "fixed_iwae_bound", False)
    info = cfg.info
    reg_variant = getattr(cfg, "reg_notmiwae_variant", "v2")
    kq, kp, ks = jax.random.split(key, 3)

    out_q = forward(params, x, mask, kq, cfg, K)
    RE_q, _, _, l_w_q = _branch(params, out_q, x, mask, missing_process)
    loss_q = _bound(l_w_q, K, fixed)

    if not info.regularized:
        return loss_q, {"RE_q": jnp.mean(RE_q)}

    if reg_variant == "sampled_mask":
        # REG_notMIWAE_new_version: draw mask_p from the learned p(s|x) of the
        # q-branch's first sample (reference: VAE.py:2232-2239)
        m = mask[:, None, :]
        x_mixed_q = out_q["x_mean"] * (1.0 - m) + x[:, None, :] * m
        logits_q = missingness_logits(params, x_mixed_q, missing_process)
        s_samples = jax.random.bernoulli(
            ks, jax.nn.sigmoid(logits_q[:, 0, :])
        ).astype(x.dtype)
        mask_p = s_samples * mask

    with_s_p = reg_variant in ("both_s", "sampled_mask")
    out_p = forward(params, x, mask_p, kp, cfg, K)
    RE_p, _, _, l_w_p = _branch(params, out_p, x, mask_p, missing_process,
                                with_s=with_s_p)
    loss_p = _bound(l_w_p, K, fixed)

    # elementwise mean of the q/p KL (the reference's `.mean()`)
    KL_reg = kl_diag_diag(out_q["mean"], out_q["logvar"], out_p["mean"],
                          out_p["logvar"], axis=None) / (
        out_q["mean"].shape[0] * out_q["mean"].shape[1])
    # reference takes the elementwise KL then .mean() (VAE.py:2448)
    extra = (mask * (1.0 - mask_p))[:, None, :]
    RE_extra = jnp.mean(
        -jnp.sum(
            normal_logpdf(x[:, None, :] * extra, out_q["x_mean"] * extra,
                          out_q["x_logvar"] * extra),
            axis=-1,
        )
    )
    loss = loss_q + cfg.alpha * (KL_reg - loss_q + loss_p + RE_extra)
    return loss, {"loss_q": loss_q, "loss_p": loss_p, "KL_reg": KL_reg}


def eval_step(params, x, mask, mask_p, key, cfg, num_samples=None,
              missing_process="selfmasking_known"):
    """llh_eval semantics (reference: VAE.py:2458-2461, 2810-2813)."""
    K = num_samples or cfg.valid_k
    fixed = getattr(cfg, "fixed_iwae_bound", False)
    sign = -1.0 if fixed else 1.0
    kq, _ = jax.random.split(key)
    out_q = forward(params, x, mask, kq, cfg, K)
    RE_q, _, _, l_w_q = _branch(params, out_q, x, mask, missing_process)
    row_loss = sign * (
        jax.scipy.special.logsumexp(sign * l_w_q, axis=1) - math.log(K)
    )
    xm = _impute(l_w_q, out_q["x_mean"])
    row_re = jnp.mean(RE_q, axis=1)
    return {"x_imputed": xm, "row_loss": row_loss, "row_negl": row_re,
            "row_negl_imp": row_re}
