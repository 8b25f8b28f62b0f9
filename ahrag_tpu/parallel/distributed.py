"""Multi-host entry: jax.distributed initialization (SURVEY §7.1 step 6).

For multi-slice / multi-host deployments (BASELINE.json config 4, fullwiki scale):
call ``initialize()`` once per process before any backend use; then ``make_mesh``
spans all hosts' devices and the corpus axis shards across slices (collectives ride
ICI within a slice, DCN across slices — lay the corpus axis innermost so the heavy
all_gather stays on ICI).

Reads the standard coordinator env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES
/ JAX_PROCESS_ID) when arguments are omitted; a single-process call is a no-op, so
the same entry point works from a laptop to a pod.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed; returns True if a multi-process setup started."""
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.getenv("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.getenv("JAX_NUM_PROCESSES", "0") or 0)
    process_id = process_id if process_id is not None else \
        int(os.getenv("JAX_PROCESS_ID", "-1") or -1)
    if not coordinator_address or num_processes <= 1 or process_id < 0:
        return False  # single-process: nothing to do
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
