"""Multi-host runtime initialization.

Thin wrapper over jax.distributed for N>=2 host pod slices. Call once at
process start; afterwards jax.devices() spans the slice and the mesh/pjit
layer in mesh.py works unchanged (GSPMD partitions over ICI within a host
block and DCN across hosts).
"""

from __future__ import annotations

from typing import Optional


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op on single-process environments
    where no coordinator is configured). Exercised cross-process by
    tests/test_multihost.py (2-process CPU-backend smoke)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_data_mesh(axis: str = "data"):
    """A 1-D mesh over every device in the (possibly multi-host) job —
    the frame-batch data-parallel axis."""
    import jax
    from jax.sharding import Mesh

    import numpy as np

    return Mesh(np.array(jax.devices()), (axis,))


def distribute_batch(local_batch, mesh=None, axis: str = "data"):
    """Form the global frame batch from each process's local shard.

    Every process passes its own [B_local, ...] frames; the result is a
    global jax.Array of shape [B_local * num_processes, ...] sharded along
    the leading axis over all devices. This is the multi-host ingestion
    point: each host's frame pump feeds only its local shard, and the
    jitted pipeline runs on the global array with GSPMD inserting any
    cross-host collectives.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        mesh = global_data_mesh(axis)
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_batch)
