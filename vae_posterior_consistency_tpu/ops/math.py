"""Numerical substrate: log-prob helpers, KLs, stable reductions, masked metrics.

Pure jnp functions shared by every model family. Semantics match the reference's
torch.distributions-based helpers (src/utils/utils.py:129-162 and the per-class
copies in src/models/VAE.py, e.g. VAE.py:164-185) so losses agree to float32
round-off.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)

#: the fixed decoder observation log-variance used by the plain/EDDI families:
#: log((0.1 * sqrt(2))^2)  (reference: src/models/VAE.py:379 and siblings)
FIXED_X_LOGVAR = math.log((0.1 * math.sqrt(2.0)) ** 2)


# ---------------------------------------------------------------------------
# Gaussian
# ---------------------------------------------------------------------------


def normal_logpdf(x, mean, logvar):
    """Element-wise log N(x; mean, exp(logvar))."""
    return -0.5 * jnp.square(x - mean) * jnp.exp(-logvar) - 0.5 * logvar - _LOG_SQRT_2PI


def normal_logpdf_scale(x, mean, scale):
    """Element-wise log N(x; mean, scale^2) parameterized by std."""
    z = (x - mean) / scale
    return -0.5 * jnp.square(z) - jnp.log(scale) - _LOG_SQRT_2PI


def gaussian_log_likelihood(targets, mean, logvar, axis=None):
    """Sum of element-wise Gaussian log-probs (reference: VAE.py:183-185)."""
    lp = normal_logpdf(targets, mean, logvar)
    return jnp.sum(lp, axis=axis)


def neg_gaussian_log_likelihood(targets, mean, logvar, axis=None):
    """Negative Gaussian log-likelihood sum (reference: VAE.py:179-181)."""
    return -gaussian_log_likelihood(targets, mean, logvar, axis=axis)


def kl_diag_std(mean, logvar, axis=None):
    """KL( N(mean, exp(logvar)) || N(0, I) ), summed (reference: VAE.py:171-173)."""
    kl = 0.5 * (jnp.exp(logvar) + jnp.square(mean) - 1.0 - logvar)
    return jnp.sum(kl, axis=axis)


def kl_diag_diag(mean1, logvar1, mean2, logvar2, axis=None):
    """KL( N1 || N2 ) for diagonal Gaussians, summed (reference: VAE.py:164-169)."""
    kl = 0.5 * (
        logvar2
        - logvar1
        + (jnp.exp(logvar1) + jnp.square(mean1 - mean2)) * jnp.exp(-logvar2)
        - 1.0
    )
    return jnp.sum(kl, axis=axis)


def kl_diag_diag_scale_elems(mean1, scale1, mean2, scale2):
    """ELEMENTWISE KL for diagonal Gaussians parameterized by std — the
    caller reduces. The reference's MIWAE regularizer torch.means over ALL
    elements (VAE.py:3270-3275), so the unreduced form is parity-load-
    bearing there (models/miwae.py)."""
    logvar1 = 2.0 * jnp.log(scale1)
    logvar2 = 2.0 * jnp.log(scale2)
    return 0.5 * (
        logvar2
        - logvar1
        + (jnp.square(scale1) + jnp.square(mean1 - mean2)) / jnp.square(scale2)
        - 1.0
    )


def kl_diag_diag_scale(mean1, scale1, mean2, scale2, axis=None):
    """Summed KL for std-parameterized diagonal Gaussians; axis=None sums
    everything, matching the kl_diag_std / kl_diag_diag convention (the
    elementwise form previously hid behind axis=None — a silent factor-of-
    B*L trap when switching parameterizations; use *_elems for that)."""
    return jnp.sum(kl_diag_diag_scale_elems(mean1, scale1, mean2, scale2),
                   axis=axis)


def reparameterize(key, mean, logvar):
    """z = mean + eps * exp(logvar/2) (reference: src/utils/utils.py:18-21)."""
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + eps * jnp.exp(0.5 * logvar)


# ---------------------------------------------------------------------------
# Bernoulli / Student-t
# ---------------------------------------------------------------------------


def bernoulli_logits_logpmf(logits, target):
    """Element-wise log Bernoulli(target; sigmoid(logits)), numerically stable.

    Matches torch.distributions.Bernoulli(logits=...).log_prob
    (used at reference: src/models/VAE.py:2434-2435)."""
    return target * logits - jnp.maximum(logits, 0.0) - jnp.log1p(jnp.exp(-jnp.abs(logits)))


def student_t_logpdf(x, loc, scale, df):
    """Element-wise Student-t log-density (MIWAE decoder likelihood,
    reference: src/models/VAE.py:3073-3076)."""
    y = (x - loc) / scale
    return (
        jax.scipy.special.gammaln(0.5 * (df + 1.0))
        - jax.scipy.special.gammaln(0.5 * df)
        - 0.5 * jnp.log(df * math.pi)
        - jnp.log(scale)
        - 0.5 * (df + 1.0) * jnp.log1p(jnp.square(y) / df)
    )


# ---------------------------------------------------------------------------
# Stable reductions
# ---------------------------------------------------------------------------


def log_mean_exp(x, axis=-1):
    """log(mean(exp(x))) along `axis` (reference: src/utils/utils.py:129-134)."""
    return jax.scipy.special.logsumexp(x, axis=axis) - jnp.log(x.shape[axis])


def logsumexp(x, axis=0):
    return jax.scipy.special.logsumexp(x, axis=axis)


def softmax_neg(x, axis=1):
    """softmax(-x) — self-normalized importance weights from negative log-weights
    (reference: src/models/VAE.py:2127-2129, applied to -l_w)."""
    return jax.nn.softmax(-x, axis=axis)


# ---------------------------------------------------------------------------
# Masked metrics
# ---------------------------------------------------------------------------


def masked_rmse(x_hat, x, hole_mask):
    """RMSE over cells where `hole_mask` is 1 (the reference computes this over
    `~mask`, i.e. the *missing* cells: src/experiment_main/evaluate.py:232-234)."""
    se = jnp.sum(jnp.square(x_hat * hole_mask - x * hole_mask))
    return jnp.sqrt(se / jnp.maximum(jnp.sum(hole_mask), 1.0))


def check(x, a, b):
    """Whether `x` falls inside the closed interval [a, b], as a bool array
    (reference: src/utils/utils.py:8-15, which returns a 1-element
    BoolTensor for a scalar `x`). Elementwise here, so it vectorizes and
    works under jit; a scalar input yields a scalar bool."""
    x = jnp.asarray(x)
    return jnp.logical_and(a <= x, x <= b)


def minmax_normalize(data, axis=0):
    """Min-max scale to [0,1] per column (reference: src/utils/loaders.py:327-332)."""
    lo = jnp.min(data, axis=axis, keepdims=True)
    hi = jnp.max(data, axis=axis, keepdims=True)
    return (data - lo) / (hi - lo)


def standardize(data, axis=0):
    """Zero-mean unit-variance per column with Bessel correction, matching
    torch `.std(0)` (reference: src/utils/loaders.py:334-336)."""
    mu = jnp.mean(data, axis=axis, keepdims=True)
    sd = jnp.std(data, axis=axis, keepdims=True, ddof=1)
    return (data - mu) / sd
