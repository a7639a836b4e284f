"""Multi-host initialization helpers.

BASELINE config #5 targets a row-partitioned solve across a multi-host pod
slice.  This module wraps the standard jax.distributed bring-up so the same
mesh/shard_map programs in `sharded.py` run across hosts: every host calls
``init_distributed()`` at startup, builds the global mesh, and feeds its
row-block of the operator.  (No multi-host hardware is available in this
environment — the code path is exercised via the virtual-device mesh tests
and the driver's dryrun; on a real slice only this init step changes.)
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Safe to call on a single host (no-op)."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=int(num_processes or os.environ.get("JAX_NUM_PROCESSES", 1)),
            process_id=int(process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID", 0)),
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def global_mesh(shape: Optional[tuple] = None):
    """Build the rows x batch mesh over ALL processes' devices."""
    from .mesh import make_mesh

    return make_mesh(jax.devices(), shape=shape)


def host_row_block(n: int, n_pad_block: int = 128) -> tuple[int, int]:
    """The contiguous row range this host owns under an even row partition
    (used when each host builds only its block of a huge operator)."""
    p, np_ = jax.process_index(), jax.process_count()
    rows_per = -(-n // np_)
    lo = min(p * rows_per, n)
    hi = min(lo + rows_per, n)
    return lo, hi
