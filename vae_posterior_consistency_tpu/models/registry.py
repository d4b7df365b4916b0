"""vae_type -> model implementation dispatch.

Mirrors the reference factory's substring-precedence contract
(reference: src/utils/loaders.py:13-246): `flow` beats `reg_vae`, `reg_notMIWAE`
maps to the v2 regularized notMIWAE, the final fallback is MIWAE. Checkpoint
reload itself lives in engine/checkpoint.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax.numpy as jnp

from vae_posterior_consistency_tpu.config import RunConfig, parse_vae_type
from vae_posterior_consistency_tpu.models import flow_vae, gauss, miwae, notmiwae
from vae_posterior_consistency_tpu.nn import core


@dataclasses.dataclass(frozen=True)
class ModelDef:
    """A model family's pure-function API surface."""

    name: str
    init: Callable  # (key, cfg, obs_dim) -> params
    train_loss: Callable  # (params, x, mask, mask_p, key, epoch, cfg) -> (loss, aux)
    eval_step: Callable  # (params, x, mask, mask_p, key, cfg) -> dict
    eval_kind: str  # 'vae' (4-tuple llh_eval) | 'miwae' (3-tuple llh_eval)
    uses_p_branch: bool
    # Gaussian posterior stats hook for the AL information reward
    # (reference: src/experiment_main/evaluate.py:546-634)
    encode_stats: Optional[Callable] = None  # (params, x, mask, cfg) -> (mean, logvar)
    # flow-posterior log-prob hook for the ratio-version AL reward
    # (reference: src/experiment_main/evaluate.py:637-708)
    encode_sample_logprob: Optional[Callable] = None  # (params,x,mask,key,cfg)->[B,L]


def _miwae_encode_stats(params, x, mask, cfg):
    """AL hook for MIWAE: the Gaussian-KL reward needs (mean, logvar); the MIWAE
    encoder emits a softplus std, converted as logvar = 2 log scale.

    (The reference feeds the scale *directly* where a logvar is expected,
    evaluate.py:562-564 with VAE.py:3175-3188 — we implement the intent.)"""
    mean, scale = miwae.encode(params, x, mask, cfg)
    return mean, 2.0 * jnp.log(scale)


def _flow_sample_logprob(params, x, mask, key, cfg):
    _, log_prob = flow_vae.encode(params, x, mask, key, cfg)
    return log_prob


_GAUSS = ModelDef(
    name="gauss",
    init=gauss.init,
    train_loss=gauss.train_loss,
    eval_step=gauss.eval_step,
    eval_kind="vae",
    uses_p_branch=True,  # refined per vae_type below
    encode_stats=gauss.encode,
)

_FLOW = ModelDef(
    name="flow",
    init=flow_vae.init,
    train_loss=flow_vae.train_loss,
    eval_step=flow_vae.eval_step,
    eval_kind="vae",
    uses_p_branch=True,
    encode_sample_logprob=_flow_sample_logprob,
)

_MIWAE = ModelDef(
    name="miwae",
    init=miwae.init,
    train_loss=miwae.train_loss,
    eval_step=miwae.eval_step,
    eval_kind="miwae",
    uses_p_branch=True,
    encode_stats=_miwae_encode_stats,
)

_NOTMIWAE = ModelDef(
    name="notmiwae",
    init=notmiwae.init,
    train_loss=notmiwae.train_loss,
    eval_step=notmiwae.eval_step,
    eval_kind="miwae",
    uses_p_branch=True,
    encode_stats=notmiwae.encode,
)

_FAMILY_TO_DEF = {
    "vanilla_flow": _FLOW,
    "reg_flow": _FLOW,
    "reg_vae": _GAUSS,
    "reg_EDDI": _GAUSS,
    "vanilla_vae": _GAUSS,
    "vanilla_EDDI": _GAUSS,
    "reg_notMIWAE": _NOTMIWAE,
    "vanilla_notMIWAE": _NOTMIWAE,
    "reg_MIWAE": _MIWAE,
    "MIWAE": _MIWAE,
}


@functools.lru_cache(maxsize=None)
def _dtype_wrapped(fn: Callable, dtype: str) -> Callable:
    """Run `fn` (a model's train_loss/eval_step) under core.compute_dtype.

    The wrapper activates during TRACING, so the dtype choice is baked into
    every compiled program built from the returned function. Memoized so
    repeated get_model(cfg) calls return EQUAL ModelDefs — the engine
    program caches compare models by equality (engine/train.py)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with core.compute_dtype(dtype):
            return fn(*args, **kwargs)

    return wrapped


def get_model(cfg: RunConfig) -> ModelDef:
    info = parse_vae_type(cfg.vae_type)
    base = _FAMILY_TO_DEF[info.family]
    model = dataclasses.replace(base, uses_p_branch=info.regularized)
    if cfg.compute_dtype not in ("float32", "bfloat16"):
        # nn/core.dense tests for the exact string 'bfloat16'; any other
        # spelling ('bf16', 'bfloat') would silently run float32 while
        # claiming mixed precision
        raise ValueError(
            f"compute_dtype must be 'float32' or 'bfloat16', "
            f"got {cfg.compute_dtype!r}")
    if cfg.compute_dtype != "float32":
        model = dataclasses.replace(
            model,
            train_loss=_dtype_wrapped(model.train_loss, cfg.compute_dtype),
            eval_step=_dtype_wrapped(model.eval_step, cfg.compute_dtype),
        )
    return model
