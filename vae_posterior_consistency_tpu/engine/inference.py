"""Inference utilities: conditional completion sampling and mutual-information
estimation.

- `completion`: M conditional imputation samples via repeated forward passes
  (reference: src/utils/utils.py:192-208) — vmapped over the sample axis
  instead of a Python loop.
- `mutual_information`: the reference's MI=True loss branch for the Gaussian
  families — KL_q / B minus KL(aggregated posterior || prior)
  (reference: src/models/VAE.py:153-158, 308-313).
- `mutual_information_kde`: the same diagnostic with the aggregated posterior
  evaluated by Gaussian KDE over posterior samples instead of the reference's
  single-Gaussian coordinate-mean shortcut.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.models import get_model
from vae_posterior_consistency_tpu.ops.math import kl_diag_std


def completion(params, x, mask, mask_p, M: int, cfg: RunConfig, key=None):
    """M conditional samples of the completed data, [M, N, D]."""
    model = get_model(cfg)
    key = jax.random.PRNGKey(cfg.seed + 5) if key is None else key

    def one(k):
        out = model.eval_step(params, x, mask, mask_p, k, cfg)
        return out["x_imputed"]

    return jax.vmap(one)(jax.random.split(key, M))


def mutual_information(params, x, mask, cfg: RunConfig):
    """MI estimate for Gaussian-posterior families:
    KL_q / B  -  KL( N(mean(mu), mean(logvar)) || N(0,I) )
    (reference: src/models/VAE.py:153-158 — the 'aggregated posterior' is the
    reference's coordinate-wise mean of the statistics)."""
    model = get_model(cfg)
    if model.encode_stats is None:
        raise NotImplementedError(
            "mutual_information needs a Gaussian-posterior family"
        )
    # every family's encode_stats contract is [B, L] (registry.ModelDef;
    # the MIWAE hook already collapses its scale head there) — no sample
    # axis ever reaches this point
    mean, logvar = model.encode_stats(params, x, mask, cfg)
    KL_q = kl_diag_std(mean, logvar)
    agg_mean = jnp.mean(mean, axis=0)
    agg_logvar = jnp.mean(logvar, axis=0)
    KL_agg = kl_diag_std(agg_mean, agg_logvar)
    return KL_q / x.shape[0] - KL_agg


def mutual_information_kde(params, x, mask, cfg: RunConfig, key=None):
    """Sharper MI diagnostic than the reference's coordinate-mean shortcut:
    MI(x; z) ~ E_x E_{z~q(z|x)} [ log q(z|x) - log q_agg(z) ], with the
    aggregated posterior q_agg evaluated by a Gaussian KDE over one posterior
    sample per row (nn/tensor_utils.gaussian_kde_log_eval; Scott's-rule
    bandwidth). The reference approximates q_agg as a single Gaussian with
    coordinate-wise mean statistics (src/models/VAE.py:153-158) — exact only
    when all posteriors coincide; the KDE form tracks multi-modal aggregates.
    q_agg is evaluated leave-one-out (each z_i scored against the other
    B−1 kernels) — the self-kernel term otherwise inflates log q_agg(z_i)
    and biases MI downward, badly at small B. Non-negative in expectation;
    ~0 for an input-independent encoder."""
    from vae_posterior_consistency_tpu.nn.tensor_utils import (
        gaussian_kde_log_eval,
    )
    from vae_posterior_consistency_tpu.ops.math import (
        normal_logpdf,
        reparameterize,
    )

    model = get_model(cfg)
    if model.encode_stats is None:
        raise NotImplementedError(
            "mutual_information_kde needs a Gaussian-posterior family"
        )
    key = jax.random.PRNGKey(cfg.seed + 6) if key is None else key
    mean, logvar = model.encode_stats(params, x, mask, cfg)  # [B, L] each
    z = reparameterize(key, mean, logvar)  # [B, L], one sample per row
    log_q = jnp.sum(normal_logpdf(z, mean, logvar), axis=-1)
    log_q_agg = gaussian_kde_log_eval(z, z, loo=True)
    return jnp.mean(log_q - log_q_agg)
