"""Flow-posterior VAE family: VAEFlow / REG_VAEFlow behavior.

Covers:
  VAEFlow     (reference: src/models/VAE.py:1860-1980)
  REG_VAEFlow (reference: src/models/VAE.py:1983-2124)

The posterior is a 3-layer conditional piecewise-linear spline flow over the
latent, conditioned on an ELU encoder trunk's 100-dim context
(reference: src/models/VAE.py:1878, 1924-1931; spline math in nn/flow.py).
KL is the Monte-Carlo difference log q(z) - log p(z) (reference: VAE.py:1958);
the reg variant's consistency term is sum|log q_q(z_q) - log q_p(z_p)|
(reference: VAE.py:2088).

Parity quirk kept: the vanilla flow's `print_loss` is the *unnormalized* loss
(reference: VAE.py:1960-1962) while every other family prints loss/B; we return
the normalized train_loss (what is saved in artifacts) everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vae_posterior_consistency_tpu.models import layers
from vae_posterior_consistency_tpu.nn import flow as flowlib
from vae_posterior_consistency_tpu.ops.math import normal_logpdf


def init(key, cfg, obs_dim):
    k_enc, k_dec = jax.random.split(key)
    params = {
        "encoder": layers.flow_context_encoder_init(
            k_enc, obs_dim, cfg.hid_dim, context_dim=cfg.latent_dim * cfg.latent_dim
        ),
        "decoder": layers.flow_decoder_init(k_dec, obs_dim, cfg.latent_dim,
                                            cfg.hid_dim),
    }
    if getattr(cfg, "flow_actnorm", False):
        # opt-in: learnable ActNorm affines between the spline layers — the
        # layer the reference defines but leaves commented out of Flow
        # (reference: src/models/VAE.py:1627-1657, 1827). Identity at init,
        # so the flow starts exactly as the plain spline stack.
        params["actnorm"] = [flowlib.actnorm_init(cfg.latent_dim)
                             for _ in range(flowlib.NUM_LAYERS)]
    return params


def _actnorm(params, cfg):
    """ActNorm affines, cross-checked against the config: a checkpoint
    trained without ActNorm evaluated under `-flow_actnorm true` (or vice
    versa) is a real mismatch, not something to silently paper over."""
    want = bool(getattr(cfg, "flow_actnorm", False))
    have = "actnorm" in params
    if want != have:
        raise ValueError(
            f"flow_actnorm={want} but the checkpoint was trained "
            f"{'with' if have else 'without'} ActNorm layers — "
            "re-train or match the flag to the checkpoint"
        )
    return params.get("actnorm")


def encode(params, x, mask, key, cfg):
    """Sample z from the flow posterior; returns (z, elementwise log q(z))
    (reference: src/models/VAE.py:1924-1931). `cfg.flow_tails` selects clamp
    (reference-effective, default) vs true linear tails."""
    context = layers.flow_context_encoder_apply(params["encoder"], x, mask)
    return flowlib.flow_forward(key, context, cfg.latent_dim,
                                tails=getattr(cfg, "flow_tails", "clamp"),
                                actnorm=_actnorm(params, cfg))


def encoder_log_prob(params, z, x, mask, cfg):
    """log q(z | x, mask) of an external z — the `backward` hook used by AIS and
    the flow-ratio AL reward (reference: src/models/VAE.py:1933-1941)."""
    context = layers.flow_context_encoder_apply(params["encoder"], x, mask)
    return flowlib.flow_log_prob(z, context, cfg.latent_dim,
                                 tails=getattr(cfg, "flow_tails", "clamp"),
                                 actnorm=_actnorm(params, cfg))


def decode(params, z):
    return layers.flow_decoder_apply(params["decoder"], z)


def _re_terms(x, x_mean, x_logvar, m, axis=None):
    """Element-wise NLL summed over masked cells (reference: VAE.py:1955-1956,
    2082-2083 — note the flow family masks inputs the same way)."""
    return -jnp.sum(normal_logpdf(x * m, x_mean * m, x_logvar * m), axis=axis)


def train_loss(params, x, mask, mask_p, key, epoch, cfg):
    """Training loss (reference: VAE.py:1950-1966 vanilla; VAE.py:2075-2103 reg)."""
    B = x.shape[0]
    info = cfg.info
    kq, kp = jax.random.split(key)

    z_q, z_logprob_q = encode(params, x, mask, kq, cfg)
    x_mean_q, x_logvar_q = decode(params, z_q)
    RE_q = _re_terms(x, x_mean_q, x_logvar_q, mask)
    prior_lp_q = normal_logpdf(z_q, jnp.zeros_like(z_q), jnp.zeros_like(z_q))
    KL_q = jnp.sum(z_logprob_q - prior_lp_q)

    if not info.regularized:
        loss = (RE_q + cfg.beta * KL_q) / B
        return loss, {"RE_q": RE_q / B, "KL_q": KL_q / B}

    z_p, z_logprob_p = encode(params, x, mask_p, kp, cfg)
    x_mean_p, x_logvar_p = decode(params, z_p)
    RE_p = _re_terms(x, x_mean_p, x_logvar_p, mask_p)
    prior_lp_p = normal_logpdf(z_p, jnp.zeros_like(z_p), jnp.zeros_like(z_p))
    KL_p = jnp.sum(z_logprob_p - prior_lp_p)

    loss_q = RE_q + cfg.beta * KL_q
    loss_p = RE_p + cfg.beta * KL_p
    KL_reg = jnp.sum(jnp.abs(z_logprob_q - z_logprob_p))
    extra_mask = mask * (1.0 - mask_p)
    RE_extra = _re_terms(x, x_mean_q, x_logvar_q, extra_mask)
    loss = (loss_q + cfg.alpha * (KL_reg - loss_q + loss_p + RE_extra)) / B
    return loss, {"RE_q": RE_q / B, "KL_q": KL_q / B, "RE_p": RE_p / B,
                  "KL_p": KL_p / B}


def eval_step(params, x, mask, mask_p, key, cfg, epoch=None):
    """llh_eval semantics (reference: VAE.py:1963-1964, 2095-2106), per-row:
    `mean(row_*)` equals the reference's sum/batch-size scalars."""
    z_q, z_logprob_q = encode(params, x, mask, key, cfg)
    x_mean_q, x_logvar_q = decode(params, z_q)
    row_re = _re_terms(x, x_mean_q, x_logvar_q, mask, axis=-1)
    row_re_imp = _re_terms(x, x_mean_q, x_logvar_q, 1.0 - mask, axis=-1)
    prior_lp = normal_logpdf(z_q, jnp.zeros_like(z_q), jnp.zeros_like(z_q))
    row_kl = jnp.sum(z_logprob_q - prior_lp, axis=-1)
    return {
        "x_imputed": x_mean_q,
        "row_loss": row_re + cfg.beta * row_kl,
        "row_negl": row_re,
        "row_negl_imp": row_re_imp,
    }
