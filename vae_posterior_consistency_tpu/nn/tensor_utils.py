"""Tensor/shape utilities mirroring the flow library's vendored support code
(reference: src/models/VAE.py:1243-1426 — nflows-derived helpers).

All are pure jnp re-implementations. Production call sites:
- `gaussian_kde_log_eval` — the aggregated-posterior density in
  engine/inference.mutual_information_kde;
- `searchsorted` — mirrors the reference's spline bin lookup
  (VAE.py:1392-1394); the production spline inlines a clipped variant tuned
  to the clamp-tails default (nn/flow.py:linear_spline_inverse).

The remainder (`tile`, dim splitters, `random_orthogonal`, the binary-mask
creators, the `is_*` type predicates) are REFERENCE-SURFACE-ONLY: they
reproduce the vendored nflows block that the reference itself never calls
from its production paths either (its `Flow` uses only the spline +
searchsorted). They are kept — small, tested — so a user porting code
written against the reference's vendored helpers finds the same names.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def tile(x, n):
    """Repeat a 1-D array n times (reference: VAE.py tile helper)."""
    assert n >= 1
    return jnp.tile(x, n)


def sum_except_batch(x, num_batch_dims=1):
    """Sum over all but the leading `num_batch_dims` dims."""
    return jnp.sum(x.reshape(x.shape[:num_batch_dims] + (-1,)), axis=-1)


def split_leading_dim(x, shape):
    """Reshape the leading dim into `shape`."""
    return x.reshape(tuple(shape) + x.shape[1:])


def merge_leading_dims(x, num_dims=2):
    """Flatten the first `num_dims` dims into one."""
    return x.reshape((-1,) + x.shape[num_dims:])


def repeat_rows(x, num_reps):
    """[B, ...] -> [B*num_reps, ...] with each row repeated contiguously."""
    return jnp.repeat(x, num_reps, axis=0)


def random_orthogonal(key, size):
    """A uniformly random orthogonal matrix (QR of a Gaussian)."""
    q, r = jnp.linalg.qr(jax.random.normal(key, (size, size)))
    return q * jnp.sign(jnp.diag(r))[None, :]


def create_alternating_binary_mask(features, even=True):
    """[1,0,1,0,...] (even) or [0,1,0,1,...] coupling mask."""
    mask = jnp.arange(features) % 2
    return (1 - mask if even else mask).astype(jnp.float32)


def create_mid_split_binary_mask(features):
    """First half 1, second half 0."""
    half = (features + 1) // 2
    return (jnp.arange(features) < half).astype(jnp.float32)


def create_random_binary_mask(key, features):
    """Exactly half (floor) of the positions set to 1, at random."""
    n_on = features // 2
    perm = jax.random.permutation(key, features)
    return jnp.zeros((features,), jnp.float32).at[perm[:n_on]].set(1.0)


def searchsorted(bin_locations, inputs, eps=1e-6):
    """Index i s.t. bin_locations[i] <= v < bin_locations[i+1], along the last
    axis (reference: VAE.py:1392-1394 — the spline's bin lookup)."""
    bin_locations = bin_locations.at[..., -1].add(eps)
    return jnp.sum(
        (inputs[..., None] >= bin_locations).astype(jnp.int32), axis=-1
    ) - 1


def gaussian_kde_log_eval(samples, query, loo: bool = False):
    """Log of a Gaussian KDE fitted on `samples` [N, D], evaluated at `query`
    [M, D] (Scott's-rule bandwidth).

    `loo=True` excludes the i-th sample's own kernel when evaluating at
    query row i (requires query to BE the fit samples, row-aligned): the
    leave-one-out form drops the self-kernel term that otherwise inflates
    the density at its own fit points, which in small-N / moderate-D
    regimes dominates the estimate (e.g. N=16, D=8: the self term alone
    contributes −D·log(bw·√2π) ≈ −5.5 nats)."""
    samples = jnp.asarray(samples)
    n, d = samples.shape
    # Scott's rule is PER-DIMENSION: h_j = sigma_j * n^(-1/(d+4)). Without
    # the data-scale factor a collapsed dim (sigma ~ 0.1) or a wide one
    # (sigma ~ 3) gets a kernel 10x too wide/narrow relative to its spread,
    # systematically over/under-smoothing log q. sigma is floored so a
    # constant dim cannot produce a zero bandwidth.
    sigma = jnp.maximum(jnp.std(samples, axis=0), 1e-6)
    h = sigma * n ** (-1.0 / (d + 4))  # [d]
    diff = (query[:, None, :] - samples[None, :, :]) / h
    log_kernel = -0.5 * jnp.sum(diff**2, axis=-1) - jnp.sum(
        jnp.log(h * jnp.sqrt(2 * jnp.pi))
    )
    if loo:
        if query.shape[0] != n:
            raise ValueError("loo=True needs query == samples (row-aligned)")
        log_kernel = jnp.where(jnp.eye(n, dtype=bool), -jnp.inf, log_kernel)
        return jax.scipy.special.logsumexp(log_kernel, axis=1) - jnp.log(
            n - 1
        )
    return jax.scipy.special.logsumexp(log_kernel, axis=1) - jnp.log(n)


def is_bool(x):
    return isinstance(x, (bool, np.bool_))


def is_int(x):
    return isinstance(x, (int, np.integer))


def is_positive_int(x):
    return is_int(x) and x > 0


def is_nonnegative_int(x):
    return is_int(x) and x >= 0


def is_power_of_two(n):
    return is_positive_int(n) and (n & (n - 1)) == 0
