"""Pallas TPU kernel: fused reparameterization + KL + posterior-consistency.

The posterior-consistency loss tail touches the encoder statistics of both
branches many times (z = mu + eps*sigma sampling, KL(q||N(0,I)), KL(p||N(0,I)),
KL(q||p)) — in the reference this is ~20 eager torch.distributions ops
(reference: src/models/VAE.py:435-446, 469-486). Here the whole tail runs as ONE
Pallas kernel gridded over [block_rows, L] VMEM tiles (bounded VMEM at any
batch size): a single pass over the statistics producing both branch samples
and all three KL scalars (accumulated in SMEM across the sequential row
grid), with a closed-form custom VJP (no stored activations beyond eps).

Design notes:
- eps is drawn with the framework's keyed `jax.random` PRNG *outside* the
  kernel so the fused path is bit-deterministic w.r.t. the same key stream as
  the unfused path (and testable on CPU in interpret mode); the z = mu + eps *
  exp(logvar/2) transform itself is fused.
- Latent dims are padded to the 128-lane tile and masked via broadcasted_iota;
  rows pad to the 8-sublane f32 tile.
- The three KL reductions land in SMEM as (1,1) scalars.
- Backward is closed-form (diag-Gaussian KLs), evaluated in one fused
  elementwise block — no residual tensors beyond (mean, logvar, eps).

Validated compiled on real TPU v5e hardware (2026-08-16): forward and the
custom VJP match the XLA reference path to 2e-5 at [512,64]/[256,32], and the
row-gridded auto path at [8192,10] (16 blocks, the dispatch regime above
PALLAS_MIN_ELEMS). Interpret-mode equivalence incl. multi-block accumulation
is pinned by tests/test_fused_posterior.py on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8


def _round_up(x, m):
    return (x + m - 1) // m * m


#: rows per grid block: 512x128 f32 = 256KB/buffer, 8 live buffers = 2MB VMEM
#: per iteration — bounded regardless of batch size
_BLOCK_ROWS = 512


def _kernel(mq_ref, lq_ref, mp_ref, lp_ref, eq_ref, ep_ref,
            zq_ref, zp_ref, klq_ref, klp_ref, klreg_ref, *,
            n_rows, n_cols, block_rows):
    """One [block_rows, Lp] tile of the fused posterior tail (VPU). The grid
    walks row-blocks sequentially; the three KL scalars accumulate in SMEM."""
    i = pl.program_id(0)
    mq, lq = mq_ref[:], lq_ref[:]
    mp, lp = mp_ref[:], lp_ref[:]
    shape = mq.shape
    # mask out row padding (global row index) and lane padding
    row0 = i * block_rows
    row_ok = row0 + jax.lax.broadcasted_iota(jnp.int32, shape, 0) < n_rows
    col_ok = jax.lax.broadcasted_iota(jnp.int32, shape, 1) < n_cols
    valid = jnp.logical_and(row_ok, col_ok).astype(jnp.float32)

    std_q = jnp.exp(0.5 * lq)
    std_p = jnp.exp(0.5 * lp)
    zq_ref[:] = mq + eq_ref[:] * std_q
    zp_ref[:] = mp + ep_ref[:] * std_p

    # KL(N(m, e^l) || N(0, I)) elementwise, masked
    kl_q = 0.5 * (jnp.exp(lq) + mq * mq - 1.0 - lq)
    kl_p = 0.5 * (jnp.exp(lp) + mp * mp - 1.0 - lp)
    # KL(q || p) elementwise
    dm = mq - mp
    kl_reg = 0.5 * (lp - lq + (jnp.exp(lq) + dm * dm) * jnp.exp(-lp) - 1.0)

    @pl.when(i == 0)
    def _init():
        klq_ref[0, 0] = 0.0
        klp_ref[0, 0] = 0.0
        klreg_ref[0, 0] = 0.0

    klq_ref[0, 0] += jnp.sum(kl_q * valid)
    klp_ref[0, 0] += jnp.sum(kl_p * valid)
    klreg_ref[0, 0] += jnp.sum(kl_reg * valid)


def _pad(x, rows, cols):
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))


def _fused_forward_impl(mean_q, logvar_q, mean_p, logvar_p, eps_q, eps_p,
                        interpret, block_rows=_BLOCK_ROWS):
    B, L = mean_q.shape
    Lp = _round_up(L, _LANE)
    block_rows = min(block_rows, _round_up(B, _SUBLANE))
    Bp = _round_up(B, block_rows)
    n_blocks = Bp // block_rows
    args = [
        _pad(a, Bp, Lp)
        for a in (mean_q, logvar_q, mean_p, logvar_p, eps_q, eps_p)
    ]
    kern = functools.partial(_kernel, n_rows=B, n_cols=L,
                             block_rows=block_rows)
    out_shapes = (
        jax.ShapeDtypeStruct((Bp, Lp), jnp.float32),  # z_q
        jax.ShapeDtypeStruct((Bp, Lp), jnp.float32),  # z_p
        jax.ShapeDtypeStruct((1, 1), jnp.float32),  # kl_q
        jax.ShapeDtypeStruct((1, 1), jnp.float32),  # kl_p
        jax.ShapeDtypeStruct((1, 1), jnp.float32),  # kl_reg
    )
    tile = pl.BlockSpec((block_rows, Lp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    z_q, z_p, klq, klp, klreg = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        out_shape=out_shapes,
        in_specs=[tile] * 6,
        out_specs=(tile, tile, smem, smem, smem),
        interpret=interpret,
    )(*args)
    return (z_q[:B, :L], z_p[:B, :L], klq[0, 0], klp[0, 0], klreg[0, 0])


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_posterior(mean_q, logvar_q, mean_p, logvar_p, eps_q, eps_p):
    """(z_q, z_p, KL_q, KL_p, KL_reg) in one fused pass.

    z_b = mean_b + eps_b * exp(logvar_b / 2);
    KL_b = sum KL(N(mean_b, e^logvar_b) || N(0,I));
    KL_reg = sum KL(q || p)   (reference: src/models/VAE.py:441-442, 469-486).
    """
    return _fused_forward_impl(mean_q, logvar_q, mean_p, logvar_p, eps_q,
                               eps_p, interpret=not _on_tpu())


def fused_posterior_reference(mean_q, logvar_q, mean_p, logvar_p, eps_q, eps_p):
    """Pure-jnp reference implementation (tests compare the kernel to this)."""
    z_q = mean_q + eps_q * jnp.exp(0.5 * logvar_q)
    z_p = mean_p + eps_p * jnp.exp(0.5 * logvar_p)
    kl_q = 0.5 * jnp.sum(jnp.exp(logvar_q) + mean_q**2 - 1.0 - logvar_q)
    kl_p = 0.5 * jnp.sum(jnp.exp(logvar_p) + mean_p**2 - 1.0 - logvar_p)
    kl_reg = 0.5 * jnp.sum(
        logvar_p - logvar_q
        + (jnp.exp(logvar_q) + (mean_q - mean_p) ** 2) * jnp.exp(-logvar_p)
        - 1.0
    )
    return z_q, z_p, kl_q, kl_p, kl_reg


def _fwd(mean_q, logvar_q, mean_p, logvar_p, eps_q, eps_p):
    outs = fused_posterior(mean_q, logvar_q, mean_p, logvar_p, eps_q, eps_p)
    return outs, (mean_q, logvar_q, mean_p, logvar_p, eps_q, eps_p)


def _bwd(res, cts):
    """Closed-form gradients of (z_q, z_p, KL_q, KL_p, KL_reg) w.r.t. the four
    statistics; one fused elementwise block."""
    mean_q, logvar_q, mean_p, logvar_p, eps_q, eps_p = res
    dz_q, dz_p, dklq, dklp, dklreg = cts
    std_q = jnp.exp(0.5 * logvar_q)
    std_p = jnp.exp(0.5 * logvar_p)
    e_lq, e_lp = jnp.exp(logvar_q), jnp.exp(logvar_p)
    dm = mean_q - mean_p

    g_mq = dz_q + dklq * mean_q + dklreg * dm * jnp.exp(-logvar_p)
    g_lq = (
        dz_q * 0.5 * eps_q * std_q
        + dklq * 0.5 * (e_lq - 1.0)
        + dklreg * 0.5 * (e_lq * jnp.exp(-logvar_p) - 1.0)
    )
    g_mp = dz_p + dklp * mean_p - dklreg * dm * jnp.exp(-logvar_p)
    g_lp = (
        dz_p * 0.5 * eps_p * std_p
        + dklp * 0.5 * (e_lp - 1.0)
        + dklreg * 0.5 * (1.0 - (e_lq + dm * dm) * jnp.exp(-logvar_p))
    )
    # eps enters only through z = mean + eps*std, so its cotangent is
    # dz*std — returning zeros here once diverged silently from the XLA
    # reference path for any caller differentiating through the noise
    # (e.g. a sticking-the-landing estimator or a full-argnum gradcheck)
    return g_mq, g_lq, g_mp, g_lp, dz_q * std_q, dz_p * std_p


fused_posterior.defvjp(_fwd, _bwd)


#: retained for API compatibility; see fused_posterior_auto for the round-2
#: measurement that retired the size-based dispatch.
PALLAS_MIN_ELEMS = 64 * 1024


def fused_posterior_auto(mean_q, logvar_q, mean_p, logvar_p, eps_q, eps_p):
    """Dispatch point for the posterior tail. MEASURED OUTCOME (round 2,
    TPU v5e, tools/bench_fused.py with the dispatch RTT amortized over a
    200-iteration in-program scan — raw per-call timing through the tunnel
    is ~27 ms of RTT and meaningless): XLA's automatic fusion of the jnp
    path beats the hand kernel at EVERY shape, and decisively at ensemble
    scale —

        rows x 10   pallas/step   xla/step   pallas speedup
             64        141 us       137 us       0.97x
           1024        144 us       133 us       0.93x
           6554        186 us       180 us       0.97x   (>= old MIN_ELEMS)
           8192        173 us       132 us       0.76x
          65536       1068 us       158 us       0.15x
         262144       5690 us       206 us       0.04x

    (re-confirmed with readback-synced barriers after the axon
    block_until_ready quirk was found — same numbers within noise)

    This tail is memory-light elementwise math: XLA fuses it into one VPU
    pass with a parallel reduction, while the kernel's sequential row-grid +
    SMEM scalar accumulation serializes block-to-block. A hand kernel cannot
    beat the compiler here and loses headroom at scale, so the auto path now
    ALWAYS uses the XLA fusion (identical math/outputs). The Pallas kernel +
    closed-form VJP remain callable directly (`fused_posterior`), validated
    on hardware and pinned by tests/test_fused_posterior.py, as the
    infrastructure template for kernels where manual fusion CAN win
    (matmul-boundary fusions, which this workload's 30k-param MLPs are too
    small to profit from)."""
    return fused_posterior_reference(mean_q, logvar_q, mean_p, logvar_p,
                                     eps_q, eps_p)
