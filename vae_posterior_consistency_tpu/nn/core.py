"""Minimal functional NN core: parameter pytrees + pure apply functions.

No stateful module framework: parameters are plain nested dicts of jnp arrays
(ideal for pjit sharding annotations, `vmap` over model ensembles, and donation),
apply functions are pure. Initializers reproduce the torch defaults the reference
relies on, so training dynamics are statistically comparable:

- `nn.Linear` default: W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))
  (torch kaiming_uniform(a=sqrt(5)) reduces to exactly this for Linear).
- `xavier_uniform` for the EDDI per-feature embeddings
  (reference: src/models/VAE.py:49-52) and the notMIWAE missing-process
  parameters W, b (reference: src/models/VAE.py:2735-2740).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

Params = dict


def torch_linear_init(key: jax.Array, fan_in: int, fan_out: int) -> Params:
    """torch.nn.Linear default init."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def xavier_uniform(key: jax.Array, shape) -> jax.Array:
    """torch.nn.init.xavier_uniform_ on a 2D (or leading-broadcast) tensor."""
    fan_in, fan_out = shape[-2], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


#: active matmul compute dtype (trace-time; see compute_dtype()). float32 is
#: the default and what every golden/parity test pins; bfloat16 engages the
#: MXU's native bf16 path (2x peak on v5e) with float32 accumulation.
_COMPUTE_DTYPE: list = ["float32"]


class compute_dtype:
    """Context manager selecting the matmul input dtype while a model function
    is being TRACED (models are jitted, so the choice is baked into the
    compiled program). With 'bfloat16', dense() casts both matmul operands to
    bf16 and accumulates in float32 (`preferred_element_type`) — the standard
    TPU mixed-precision recipe: parameters, optimizer state, and all
    elementwise math stay float32; only the MXU operands narrow. Installed
    per-run via RunConfig.compute_dtype (models/registry.get_model wraps the
    model fns)."""

    def __init__(self, dtype: str = "float32"):
        self.dtype = dtype

    def __enter__(self):
        _COMPUTE_DTYPE.append(self.dtype)

    def __exit__(self, *exc):
        _COMPUTE_DTYPE.pop()


def dense(params: Params, x: jax.Array) -> jax.Array:
    """y = x @ W + b. Accumulates in float32 on the MXU; operand dtype is
    selected by compute_dtype() (bf16 operands halve HBM traffic and double
    MXU peak, sums still f32)."""
    if _COMPUTE_DTYPE[-1] == "bfloat16":
        return (
            jnp.dot(x.astype(jnp.bfloat16), params["w"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            + params["b"]
        )
    return jnp.dot(x, params["w"], preferred_element_type=jnp.float32) + params["b"]


# ---------------------------------------------------------------------------
# MLP
# ---------------------------------------------------------------------------

ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "identity": lambda x: x,
}


def mlp_init(key: jax.Array, sizes: Sequence[int]) -> Params:
    """Init an MLP with len(sizes)-1 Linear layers."""
    keys = jax.random.split(key, len(sizes) - 1)
    return {
        f"layer{i}": torch_linear_init(k, sizes[i], sizes[i + 1])
        for i, k in enumerate(keys)
    }


def mlp_apply(
    params: Params,
    x: jax.Array,
    hidden_act: str = "relu",
    final_act: str = "identity",
) -> jax.Array:
    """Apply an MLP: `hidden_act` between layers, `final_act` on the output."""
    n = len(params)
    act = ACTIVATIONS[hidden_act]
    for i in range(n):
        x = dense(params[f"layer{i}"], x)
        if i < n - 1:
            x = act(x)
    return ACTIVATIONS[final_act](x)


def hardtanh(x: jax.Array, min_val: float, max_val: float) -> jax.Array:
    """torch.nn.Hardtanh (notMIWAE decoder logvar clamp,
    reference: src/models/VAE.py:2363)."""
    return jnp.clip(x, min_val, max_val)


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
