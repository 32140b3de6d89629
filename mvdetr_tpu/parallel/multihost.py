"""Multi-host (pod-slice) support.

The reference is single-process (`/root/reference/main.py:97-98`); this module
adds the standard JAX multi-host recipe: per-host initialization, host-sharded
data loading, and global-array assembly. On a pod slice, each host loads the
frames for its data-axis shard and the arrays are assembled into globally
sharded jax.Arrays; gradients all-reduce over ICI within a slice and DCN
across hosts (only the ``data`` axis crosses hosts).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Idempotent ``jax.distributed.initialize`` (no-op single-process).

    On the CPU backend, multi-process collectives need the gloo implementation
    selected before the backend initializes (`tests/test_multihost.py` runs
    the 2-process recipe on localhost)."""
    if num_processes is None or num_processes <= 1:
        return
    import os

    plats = str(jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", ""))
    if "cpu" in plats:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except RuntimeError:
        pass  # already initialized


def process_batch_slice(total_batch: int) -> slice:
    """The frame-index slice this host should load for a global batch."""
    n = jax.process_count()
    per = total_batch // n
    start = jax.process_index() * per
    return slice(start, start + per)


def global_batch_from_local(local_batch: dict, mesh: Mesh) -> dict:
    """Assemble host-local numpy batches into globally sharded jax.Arrays."""
    from mvdetr_tpu.parallel.sharding import batch_shardings

    shardings = batch_shardings(mesh)

    def put(x, s):
        if jax.process_count() == 1:
            return jax.device_put(x, s)
        return jax.make_array_from_process_local_data(s, np.asarray(x))

    return jax.tree.map(put, local_batch, shardings, is_leaf=lambda x: not isinstance(x, dict))
