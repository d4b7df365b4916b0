"""Multi-host orchestration (single-controller JAX over multiple processes).

SURVEY.md §2.5 'Host orchestration': the reference is single-process; scaling
past one host uses `jax.distributed.initialize` so every process sees the
global device set, and per-process data feeding via
`make_array_from_process_local_data`. This module wraps the initialization
handshake and the global-mesh construction; it is inert on a single host.
"""

from __future__ import annotations

import os

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-process JAX cluster.

    With no arguments, reads the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or the
    platform's auto-detection; a no-op when unconfigured (single host).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(dp: int | None = None, tp: int | None = None):
    """Build the (dp, tp) mesh over ALL processes' devices."""
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib

    return meshlib.make_mesh(jax.devices(), dp=dp, tp=tp)


def shard_host_data(mesh, x):
    """Assemble a globally-sharded batch from per-process local rows."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp", None)), x
    )


def is_coordinator() -> bool:
    return jax.process_index() == 0
