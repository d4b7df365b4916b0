"""Device-mesh construction and sharding rules.

The reference is single-process single-device (SURVEY.md §2.5;
reference: src/experiment_main/imputation.py:16). The TPU framework scales via
`jax.sharding.Mesh` with two axes:

- `dp`  — data parallelism: the batch axis is sharded across ICI; gradient
  all-reduce is emitted by XLA (`psum`) because parameters are replicated
  across `dp`.
- `tp`  — tensor parallelism: wide MLP layers (hid_dim >= TP_MIN_DIM) shard
  their output features across `tp`; XLA inserts the activation collectives.

Use `make_mesh()` for all available devices or `make_mesh(devices)` for an
explicit subset (tests use a virtual 8-CPU-device mesh via
XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: only shard weight matrices at least this wide over `tp` — below it, the
#: collective cost outweighs the matmul split (the 128-lane MXU tile is the
#: natural floor)
TP_MIN_DIM = 128


def factor_devices(n: int) -> tuple[int, int]:
    """Split n devices into (dp, tp): prefer tp=2 when divisible and n >= 4."""
    if n >= 4 and n % 2 == 0:
        return n // 2, 2
    return n, 1


def make_mesh(devices=None, dp: int | None = None, tp: int | None = None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if dp is None or tp is None:
        dp, tp = factor_devices(n)
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    return Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, D] batches: shard rows over dp, replicate features."""
    return NamedSharding(mesh, P("dp", None))


def param_sharding_rule(leaf, mesh: Mesh) -> NamedSharding:
    """Tensor-parallel layout for one parameter leaf.

    Weight matrices [fan_in, fan_out]: shard whichever dim is wide enough over
    `tp` (preferring fan_out so the matmul is column-parallel); biases follow
    their layer's fan_out. Everything else is replicated.
    """
    shape = leaf.shape
    if len(shape) == 2 and shape[1] >= TP_MIN_DIM:
        return NamedSharding(mesh, P(None, "tp"))
    if len(shape) == 2 and shape[0] >= TP_MIN_DIM:
        return NamedSharding(mesh, P("tp", None))
    if len(shape) == 1 and shape[0] >= TP_MIN_DIM:
        return NamedSharding(mesh, P("tp"))
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Apply `param_sharding_rule` across the params pytree."""

    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, param_sharding_rule(leaf, mesh)),
        params,
    )


def params_shardings(params, mesh: Mesh):
    """The matching pytree of NamedShardings (for jit in_shardings)."""

    return jax.tree_util.tree_map(
        lambda leaf: param_sharding_rule(leaf, mesh), params
    )
