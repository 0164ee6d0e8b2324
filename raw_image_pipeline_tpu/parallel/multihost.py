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
    where no coordinator is configured)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
