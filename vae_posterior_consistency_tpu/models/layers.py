"""Encoder/decoder building blocks for the model matrix.

The reference's 17 model classes factor into a small set of encoder families x
decoder likelihoods (SURVEY.md §7 "Design stance"). Each builder returns
(init_fn, apply_fn) pairs over plain parameter pytrees.

Encoder families:
- dense        — MLP on x*mask                (reference: src/models/VAE.py:366-372, 387-395)
- dense_mask   — MLP on [x*mask, mask]        (reference: src/models/VAE.py:526-532, 545-555)
- pointnet     — EDDI per-feature embed + masked sum-pool
                                              (reference: src/models/VAE.py:687-741)
- miwae        — ReLU trunk, softplus scale   (reference: src/models/VAE.py:3026-3059)
- notmiwae     — ELU/Tanh trunk, mu/logstd heads (reference: src/models/VAE.py:2342-2390, 2865-2922)
- flow_context — ELU trunk -> spline context  (reference: src/models/VAE.py:1882-1931)

Decoder likelihoods:
- sigmoid_fixed   — sigmoid mean, fixed logvar log((0.1*sqrt2)^2)
                                              (reference: src/models/VAE.py:374-379, 397-401)
- notmiwae        — sigmoid mean, hardtanh(-10,0) logvar (reference: VAE.py:2359-2363)
- notmiwae_author — linear mean, softplus std (reference: VAE.py:2885-2928)
- student_t       — (mean, scale, df) heads   (reference: VAE.py:3034-3066)
- flow            — ELU trunk, sigmoid mean, logvar head overridden by -8
                                              (reference: VAE.py:1895-1948)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vae_posterior_consistency_tpu.nn import core
from vae_posterior_consistency_tpu.ops import fused_embed_pool


# ---------------------------------------------------------------------------
# Gaussian-posterior encoders (return mean, logvar)
# ---------------------------------------------------------------------------


def dense_encoder_init(key, obs_dim, latent_dim, widths=(100, 50)):
    return core.mlp_init(key, [obs_dim, *widths, 2 * latent_dim])


def dense_encoder_apply(params, x, mask):
    h = core.mlp_apply(params, x * mask, hidden_act="relu")
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, logvar


def dense_mask_encoder_init(key, obs_dim, latent_dim, widths=(100, 50)):
    return core.mlp_init(key, [2 * obs_dim, *widths, 2 * latent_dim])


def dense_mask_encoder_apply(params, x, mask):
    h = core.mlp_apply(params, jnp.concatenate([x * mask, mask], axis=-1),
                       hidden_act="relu")
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, logvar


def pointnet_encoder_init(key, obs_dim, latent_dim, emb_dim, trunk_widths=(100, 50)):
    """EDDI/PointNet encoder. `trunk_widths=(500,500,200)` for the MNIST variant
    (reference: src/models/VAE.py:32-40 vs 692-698)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "pnp1": core.mlp_init(k1, [2 + emb_dim, emb_dim]),
        "pnp2": core.mlp_init(k2, [emb_dim, *trunk_widths, 2 * latent_dim]),
        "type_pars": core.xavier_uniform(k3, (obs_dim, emb_dim)),
        "type_bias": core.xavier_uniform(k4, (obs_dim, 1)),
    }


def pointnet_encoder_apply(params, x, mask):
    """Per-feature embed [x_d, x_d*W_d, b_d] -> Linear+ReLU -> masked sum-pool -> trunk
    (reference: src/models/VAE.py:719-741).

    TPU optimization (algebraically identical to the reference's batched
    [B*D, K+2] @ [K+2, K] matmul): because the embedding features are linear
    in the scalar x_d, the per-feature Linear collapses to
        emb[b,d,:] = x[b,d] * A[d,:] + C[d,:]
    with A = W1[0] + type_pars @ W1[1:K+1] and C = type_bias * W1[K+1] + b1
    — a batch-INDEPENDENT [D,K+2]->[D,K] precompute (hoisted by XLA out of
    the batch dim) plus pure fused elementwise work. This removes the one
    K-contraction matmul the MXU tiles badly (K+2 ~ 12 lanes of a 128-wide
    systolic pass) and cuts the encoder's per-sample embed FLOPs ~10x at
    MNIST scale (784 features)."""
    agg = _pointnet_pool(params, x, mask)
    h = core.mlp_apply(params["pnp2"], agg, hidden_act="relu")
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, logvar


def _pointnet_embed(params, x):
    """The collapsed per-feature embedding relu(x_d * A_d + C_d) — [B, D, K].
    Mask-INDEPENDENT: only the pooling weights differ between the q/p
    branches, so regularized training computes this once for both.

    Under compute_dtype='bfloat16' the [B, D, K] intermediate is held in
    bf16 — this tensor dominates the training step's HBM traffic at MNIST
    scale (784 features; see profiles/mnist_eddi), and unlike the matmuls
    (which XLA's DEFAULT TPU precision already runs as bf16-with-f32-
    accumulate) elementwise chains only narrow when asked."""
    A, C = _pointnet_affine(params)
    if core._COMPUTE_DTYPE[-1] == "bfloat16":
        return jax.nn.relu(x[..., None].astype(jnp.bfloat16)
                           * A.astype(jnp.bfloat16)
                           + C.astype(jnp.bfloat16))
    return jax.nn.relu(x[..., None] * A + C)


def _pointnet_affine(params):
    """The collapsed embed's batch-independent affine: (A, C), both [D, K]
    (see _pointnet_embed)."""
    W1 = params["pnp1"]["layer0"]["w"]  # [K+2, K]
    b1 = params["pnp1"]["layer0"]["b"]  # [K]
    A = W1[0] + params["type_pars"] @ W1[1:-1]  # [D, K]
    C = params["type_bias"] * W1[-1] + b1  # [D, K]
    return A, C


def _pointnet_pool_multi(params, x, masks):
    """Pool the shared [B, D, K] embedding under a STACK of masks
    [S, B, D] -> [S, B, K]. The single definition of the fused-kernel/XLA
    dispatch and the bf16-store/f32-accumulate policy — both the
    single-mask and the q/p-branch callers go through here, so the gating
    and dtype rules cannot drift apart."""
    if fused_embed_pool.enabled():
        # opt-in Pallas fused embed+pool (measured slower than XLA's own
        # fusion at the bench shape — ops/fused_embed_pool.py docstring)
        A, C = _pointnet_affine(params)
        return fused_embed_pool.embed_pool(x, masks, A, C)
    # pool in f32 regardless of the embed's storage dtype (bf16 emb halves
    # the HBM traffic; the 784-term reduction still accumulates in f32 —
    # the convert fuses into the reduce, nothing f32 is materialized).
    # einsum and broadcast-multiply+sum canonicalize to the same reduce
    # (checked bitwise on CPU), so one spelling serves every caller.
    emb = _pointnet_embed(params, x).astype(jnp.float32)
    return jnp.einsum("sbd,bdk->sbk", masks, emb,
                      preferred_element_type=jnp.float32)


def _pointnet_pool(params, x, mask):
    return _pointnet_pool_multi(params, x, mask[None])[0]  # [B, K]


def pointnet_encoder_apply_2masks(params, x, mask_q, mask_p):
    """Both posterior branches of a regularized EDDI model in one pass:
    the [B, D, K] embedding is computed ONCE (it does not depend on the
    mask) and pooled under each branch's mask; the trunk then runs on the
    stacked [2, B, K] aggregate. Returns (mean, logvar) shaped [2, B, L]
    (row 0 = q branch, row 1 = p branch).

    This halves the embed's forward FLOPs/bytes AND its backward
    reduction — at MNIST scale (D=784) the [2B, D, K] embed backward was
    the single largest op in the profiled training step (25% of step
    time, profiles/mnist_eddi). Values are identical to two independent
    passes; only the batch-dim layout differs."""
    # shared [B, D, K] embed pooled under both branch masks in one
    # contraction (dispatch + dtype policy: _pointnet_pool_multi)
    agg = _pointnet_pool_multi(params, x, jnp.stack([mask_q, mask_p]))
    h = core.mlp_apply(params["pnp2"], agg, hidden_act="relu")
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, logvar


def miwae_encoder_init(key, obs_dim, latent_dim):
    return core.mlp_init(key, [obs_dim, 128, 128, 2 * latent_dim])


def miwae_encoder_apply(params, x, mask):
    """Returns (mean, scale) with softplus scale (reference: VAE.py:3047-3059)."""
    h = core.mlp_apply(params, x * mask, hidden_act="relu")
    mean, pre_scale = jnp.split(h, 2, axis=-1)
    return mean, jax.nn.softplus(pre_scale)


def notmiwae_encoder_init(key, obs_dim, latent_dim):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "trunk": core.mlp_init(k1, [obs_dim, 128, 128]),
        "q_mu": core.mlp_init(k2, [128, latent_dim]),
        "q_logstd": core.mlp_init(k3, [128, latent_dim]),
    }


def notmiwae_encoder_apply(params, x, mask, variant="changed"):
    """Returns (mean, logvar). `changed` = ELU trunk, no clipping
    (reference: VAE.py:2748-2763); `author` = Tanh trunk with hardtanh(-10,10)
    on the logstd head (reference: VAE.py:2865-2922)."""
    act = "elu" if variant == "changed" else "tanh"
    h = core.mlp_apply(params["trunk"], x * mask, hidden_act=act, final_act=act)
    mean = core.dense(params["q_mu"]["layer0"], h)
    logvar = core.dense(params["q_logstd"]["layer0"], h)
    if variant == "author":
        logvar = core.hardtanh(logvar, -10.0, 10.0)
    return mean, logvar


def flow_context_encoder_init(key, obs_dim, hid_dim, context_dim=100):
    return core.mlp_init(key, [2 * obs_dim, hid_dim, hid_dim, context_dim])


def flow_context_encoder_apply(params, x, mask):
    """ELU trunk over [x*mask, mask] -> spline conditioning context
    (reference: src/models/VAE.py:1882-1890, 1924-1926)."""
    return core.mlp_apply(
        params, jnp.concatenate([x * mask, mask], axis=-1), hidden_act="elu"
    )


# ---------------------------------------------------------------------------
# Decoders
# ---------------------------------------------------------------------------


def sigmoid_decoder_init(key, obs_dim, latent_dim, widths=(50, 100)):
    """`widths=(200,500,500)` for the MNIST variant (reference: VAE.py:41-44)."""
    return core.mlp_init(key, [latent_dim, *widths, obs_dim])


def sigmoid_decoder_apply(params, z):
    return core.mlp_apply(params, z, hidden_act="relu", final_act="sigmoid")


def notmiwae_decoder_init(key, obs_dim, latent_dim):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "trunk": core.mlp_init(k1, [latent_dim, 128, 128]),
        "x_mean": core.mlp_init(k2, [128, obs_dim]),
        "x_logvar": core.mlp_init(k3, [128, obs_dim]),
    }


def notmiwae_decoder_apply(params, z, variant="changed"):
    """Returns (x_mean, x_logvar). `changed`: ELU trunk, sigmoid mean, hardtanh
    logvar (reference: VAE.py:2726-2770). `author`: Tanh trunk, linear mean,
    softplus-std head with logvar = log(std^2) (reference: VAE.py:2885-2928)."""
    if variant == "changed":
        h = core.mlp_apply(params["trunk"], z, hidden_act="elu", final_act="elu")
        x_mean = jax.nn.sigmoid(core.dense(params["x_mean"]["layer0"], h))
        x_logvar = core.hardtanh(core.dense(params["x_logvar"]["layer0"], h), -10.0, 0.0)
    else:
        h = core.mlp_apply(params["trunk"], z, hidden_act="tanh", final_act="tanh")
        x_mean = core.dense(params["x_mean"]["layer0"], h)
        x_std = jax.nn.softplus(core.dense(params["x_logvar"]["layer0"], h))
        x_logvar = jnp.log(jnp.square(x_std))
    return x_mean, x_logvar


def student_t_decoder_init(key, obs_dim, latent_dim):
    return core.mlp_init(key, [latent_dim, 128, 128, 3 * obs_dim])


def student_t_decoder_apply(params, z):
    """Returns (mean, scale, df) (reference: VAE.py:3061-3066)."""
    h = core.mlp_apply(params, z, hidden_act="relu")
    mean, scale, df = jnp.split(h, 3, axis=-1)
    return (
        jax.nn.sigmoid(mean),
        jax.nn.softplus(scale) + 0.001,
        jax.nn.softplus(df) + 3.0,
    )


def flow_decoder_init(key, obs_dim, latent_dim, hid_dim):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "trunk": core.mlp_init(k1, [latent_dim, hid_dim, hid_dim, hid_dim, hid_dim]),
        "mean": core.mlp_init(k2, [hid_dim, obs_dim]),
        "logvar": core.mlp_init(k3, [hid_dim, obs_dim]),
    }


#: fixed flow-decoder observation logvar (reference: src/models/VAE.py:1874)
FLOW_OBS_LOGVAR = -8.0


def flow_decoder_apply(params, z, obs_logvar=FLOW_OBS_LOGVAR):
    h = core.mlp_apply(params["trunk"], z, hidden_act="elu", final_act="elu")
    x_mean = jax.nn.sigmoid(core.dense(params["mean"]["layer0"], h))
    x_logvar = core.dense(params["logvar"]["layer0"], h)
    if obs_logvar is not None:
        x_logvar = jnp.full_like(x_logvar, obs_logvar)
    return x_mean, x_logvar
