"""Fused EDDI embed + masked-pool Pallas kernel.

The pointnet encoder's hot pair at MNIST scale is
    emb[b,d,k] = relu(x[b,d] * A[d,k] + C[d,k])          # [B, D, K]
    agg[s,b,k] = sum_d masks[s,b,d] * emb[b,d,k]          # [S, B, K]
(models/layers.py:_pointnet_embed/_pointnet_pool; the collapsed form of the
reference's per-feature Linear, src/models/VAE.py:719-741). XLA materializes
the [B, D, K] embed in HBM — 32 MB at B=1024/D=784/K=10 — writes it forward,
reads it back for the pool, and touches it again for the pool backward; the
profiled step's multiply_reduce/layout time is dominated by exactly this
traffic (profiles/mnist_eddi_r3b).

This kernel never materializes the embed: each grid program holds a [TB, D]
tile of x and the masks in VMEM and computes, per output feature k, the
[TB, D] embed slice on the VPU and reduces it immediately. HBM traffic drops
from ~3x|emb| to |x| + |masks| + |agg| (~9 MB at the bench shape). The
backward (custom VJP) recomputes the embed per (k, tile) the same way and
emits dx, dmasks, dA, dC in one pass, accumulating the [K, D] weight grads
across the sequential TPU grid.

MEASURED AND REJECTED (2026-08-17, one v5e, B=1024/D=784/K=10, best-of-3
readback-synced, 50-100 iterations amortized per dispatch):

    fwd+bwd:  XLA 589 us   Pallas 812 us   (XLA 1.38x faster)
    fwd only: XLA 331 us   Pallas 341 us   (tie)

The premise — that XLA materializes the [B, D, K] embed — is FALSE on this
workload: the profiled `multiply_reduce_fusion` ops are XLA fusing the relu
producer directly into the pool reduction (and re-fusing the recompute into
the transpose pass for the backward), so there is no HBM round-trip to save
and the kernel's serial per-k VPU loop loses to XLA's schedule. This is the
second Pallas-vs-XLA-fusion measurement in this repo (ops/fused_posterior.py
reached the same verdict for the ELBO chain) and strengthens the RESULTS.md
roofline argument: the non-matmul 46% of the MNIST-EDDI step is already
executed by fusions a hand-written kernel does not beat.

The kernel stays as validated infrastructure (exactness + grad tests in
tests/test_fused_embed_pool.py; if anything it is MORE precise than the XLA
path, whose einsum runs on the MXU's bf16 multipliers — kernel-vs-XLA
maxdiff ~2.7e-4 relative is XLA's bf16 rounding, not ours). Gating:
`fused_embed_pool()` context (trace-time, mirrors nn/core's compute_dtype
stack), default 'off'; 'on' forces the kernel (interpret-mode off-TPU, used
by the tests); 'auto' selects it on the TPU backend — retained so a future
shape where the tradeoff flips can re-engage it without code changes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: trace-time switch: 'auto' | 'on' | 'off'. 'on' forces the kernel even on
#: CPU (interpret mode — for tests); 'auto' engages it on TPU only. Default
#: 'off': the XLA fusion path measured faster (module docstring).
_FUSED: list = ["off"]


class fused_embed_pool:
    """Context manager selecting the embed+pool implementation while a model
    function is being traced (mirrors nn/core.compute_dtype)."""

    def __init__(self, mode: str = "auto"):
        if mode not in ("auto", "on", "off"):
            raise ValueError(f"fused_embed_pool mode must be auto|on|off, "
                             f"got {mode!r}")
        self.mode = mode

    def __enter__(self):
        _FUSED.append(self.mode)

    def __exit__(self, *exc):
        _FUSED.pop()


def enabled() -> bool:
    """True when the Pallas kernel should be used at this trace point."""
    mode = _FUSED[-1]
    if mode == "on":
        return True
    if mode == "off":
        return False
    return jax.default_backend() == "tpu"


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(S: int, K: int, x_ref, m_ref, a_ref, c_ref, out_ref):
    x = x_ref[:]  # [TB, Dp]
    for k in range(K):
        pre = x * a_ref[k : k + 1, :] + c_ref[k : k + 1, :]
        e = jnp.maximum(pre, 0.0)
        for s in range(S):
            out_ref[s, :, k : k + 1] = jnp.sum(
                m_ref[s] * e, axis=1, keepdims=True
            )


def _bwd_kernel(S: int, K: int, x_ref, m_ref, a_ref, c_ref, g_ref,
                dx_ref, dm_ref, da_ref, dc_ref):
    # dA/dC accumulate across the (sequential) grid: zero them once, then +=
    @pl.when(pl.program_id(0) == 0)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)

    x = x_ref[:]  # [TB, Dp]
    dx = jnp.zeros_like(x)
    dms = [jnp.zeros_like(x) for _ in range(S)]
    for k in range(K):
        a_k = a_ref[k : k + 1, :]
        pre = x * a_k + c_ref[k : k + 1, :]
        act = (pre > 0.0).astype(x.dtype)
        e = jnp.maximum(pre, 0.0)
        gsum = m_ref[0] * g_ref[0, :, k : k + 1]
        for s in range(1, S):
            gsum = gsum + m_ref[s] * g_ref[s, :, k : k + 1]
        gact = gsum * act  # [TB, Dp]
        dx = dx + gact * a_k
        for s in range(S):
            dms[s] = dms[s] + e * g_ref[s, :, k : k + 1]
        da_ref[k : k + 1, :] += jnp.sum(x * gact, axis=0, keepdims=True)
        dc_ref[k : k + 1, :] += jnp.sum(gact, axis=0, keepdims=True)
    dx_ref[:] = dx
    for s in range(S):
        dm_ref[s] = dms[s]


# ---------------------------------------------------------------------------
# pallas_call wrappers (padded shapes)
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tb(Bp: int) -> int:
    # 128 rows/tile: the backward holds x + masks + dx + dmasks blocks
    # (double-buffered by the pipeline) in VMEM — 256-row tiles exceeded the
    # 16 MB scoped-vmem limit at D=896 (measured: 17.41M requested)
    return min(128, Bp)


def _fwd_call(x, masks, a_t, c_t):
    S, Bp, Dp = masks.shape
    K = a_t.shape[0]
    TB = _tb(Bp)
    grid = (Bp // TB,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, S, K),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, Dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, TB, Dp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, TB, K), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, Bp, K), x.dtype),
        interpret=_interpret(),
    )(x, masks, a_t, c_t)


def _bwd_call(x, masks, a_t, c_t, g):
    S, Bp, Dp = masks.shape
    K = a_t.shape[0]
    TB = _tb(Bp)
    grid = (Bp // TB,)
    dx, dm, da_t, dc_t = pl.pallas_call(
        functools.partial(_bwd_kernel, S, K),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, Dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, TB, Dp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, TB, K), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, Dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, TB, Dp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            # dA/dC: every program maps the SAME full block -> VMEM-resident
            # accumulation across the sequential grid
            pl.BlockSpec((K, Dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Dp), x.dtype),
            jax.ShapeDtypeStruct((S, Bp, Dp), x.dtype),
            jax.ShapeDtypeStruct((K, Dp), x.dtype),
            jax.ShapeDtypeStruct((K, Dp), x.dtype),
        ],
        interpret=_interpret(),
    )(x, masks, a_t, c_t, g)
    return dx, dm, da_t, dc_t


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@jax.custom_vjp
def embed_pool(x, masks, A, C):
    """agg[s,b,k] = sum_d masks[s,b,d] * relu(x[b,d]*A[d,k] + C[d,k]).

    x: [B, D] float32; masks: [S, B, D]; A, C: [D, K]. Returns [S, B, K]
    float32. Pallas on TPU (interpret-mode elsewhere); algebraically
    identical to the XLA einsum path in models/layers.py (reduction order
    over d differs -> float-roundoff-level deviations only).
    """
    return _embed_pool_fwd(x, masks, A, C)[0]


def _pad(x, masks, A, C):
    B, D = x.shape
    Dp = _round_up(D, 128)
    # batch tile (see _tb) or the whole sublane-padded batch when smaller;
    # Bp is a multiple of the tile, so _tb(Bp) recovers the same tile size
    Bp = _round_up(B, min(128, _round_up(B, 8)))
    x_p = jnp.pad(x.astype(jnp.float32), ((0, Bp - B), (0, Dp - D)))
    m_p = jnp.pad(masks.astype(jnp.float32),
                  ((0, 0), (0, Bp - B), (0, Dp - D)))
    a_t = jnp.pad(A.astype(jnp.float32).T, ((0, 0), (0, Dp - D)))
    c_t = jnp.pad(C.astype(jnp.float32).T, ((0, 0), (0, Dp - D)))
    return x_p, m_p, a_t, c_t


def _embed_pool_fwd(x, masks, A, C):
    B, D = x.shape
    x_p, m_p, a_t, c_t = _pad(x, masks, A, C)
    out = _fwd_call(x_p, m_p, a_t, c_t)
    return out[:, :B, :], (x, masks, A, C)


def _embed_pool_bwd(res, g):
    x, masks, A, C = res
    B, D = x.shape
    S = masks.shape[0]
    K = A.shape[1]
    x_p, m_p, a_t, c_t = _pad(x, masks, A, C)
    Bp = x_p.shape[0]
    g_p = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, Bp - B), (0, 0)))
    dx, dm, da_t, dc_t = _bwd_call(x_p, m_p, a_t, c_t, g_p)
    return (
        dx[:B, :D].astype(x.dtype),
        dm[:, :B, :D].astype(masks.dtype),
        da_t.T[:D, :].astype(A.dtype),
        dc_t.T[:D, :].astype(C.dtype),
    )


embed_pool.defvjp(_embed_pool_fwd, _embed_pool_bwd)


def embed_pool_reference(x, masks, A, C):
    """The XLA formulation (what models/layers.py computes today) — the
    equivalence oracle for the kernel tests."""
    emb = jax.nn.relu(x[..., None] * A + C)  # [B, D, K]
    return jnp.einsum("sbd,bdk->sbk", masks, emb,
                      preferred_element_type=jnp.float32)
