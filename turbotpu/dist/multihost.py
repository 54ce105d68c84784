"""Multi-host runtime bring-up (SURVEY.md section 3, component 25).

One process per host; `init_distributed()` wires `jax.distributed` so the
global mesh spans every chip of every host, and codeword batches are fed
per-host with `jax.make_array_from_process_local_data` (each host generates
only its own shard -- no cross-host data motion on the input path; DCN
carries only boundary metrics and psum counters).

On a single host (or under the fake-device CPU config) everything degrades
to no-ops, so the same harness code runs everywhere.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or env; returns True if
    multi-process mode is active.

    Env fallbacks: TURBOTPU_COORDINATOR, TURBOTPU_NUM_PROCS, TURBOTPU_PROC_ID
    (or standard cluster auto-detection when everything is None).
    """
    coordinator = coordinator or os.environ.get("TURBOTPU_COORDINATOR")
    if num_processes is None and "TURBOTPU_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["TURBOTPU_NUM_PROCS"])
    if process_id is None and "TURBOTPU_PROC_ID" in os.environ:
        process_id = int(os.environ["TURBOTPU_PROC_ID"])
    if coordinator is None and num_processes is None:
        return jax.process_count() > 1
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count() > 1


def host_local_batch(global_batch: int) -> int:
    """Codewords this host must generate for a 'data'-sharded global batch."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n


def make_global_array(local: np.ndarray, mesh: jax.sharding.Mesh,
                      spec: P = P(("data",), None)) -> jax.Array:
    """Assemble per-host local shards into one global sharded array."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)
