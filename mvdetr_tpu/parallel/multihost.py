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


def process_batch_slice(total_batch: int, mesh: Optional[Mesh] = None) -> slice:
    """The frame-index slice this host should load for a global batch.

    Mesh-aware: frames split across processes only along the portion of the
    ``data`` axis this process's devices own. When the data axis does not
    span processes (e.g. a 2-process ``view``- or ``bev``-sharded mesh),
    every host loads the full batch and the sharded assembly slices out each
    device's piece (`global_batch_from_local`)."""
    n = jax.process_count()
    if n == 1:
        return slice(0, total_batch)
    if mesh is None:  # legacy pure-data layout: one equal frame block per host
        per = total_batch // n
        start = jax.process_index() * per
        return slice(start, start + per)
    data = int(dict(mesh.shape).get("data", 1))
    if data <= 1:
        return slice(0, total_batch)
    # data rows owned by this process (mesh.devices axis 0 = 'data')
    pid = jax.process_index()
    owned = [i for i in range(data) if any(d.process_index == pid for d in mesh.devices[i].flat)]
    assert owned == list(range(owned[0], owned[-1] + 1)), (
        f"process {pid} owns non-contiguous data rows {owned}; build the mesh with "
        f"process-contiguous device order (parallel/mesh.py does)"
    )
    per = total_batch // data
    return slice(owned[0] * per, (owned[-1] + 1) * per)


def global_batch_from_local(local_batch: dict, mesh: Mesh, frame_offset: int = 0,
                            global_batch: Optional[int] = None) -> dict:
    """Assemble host-local numpy batches into globally sharded jax.Arrays.

    ``frame_offset``/``global_batch``: when each host loads only a frame
    block (`process_batch_slice`), the local arrays cover global frame rows
    ``[frame_offset, frame_offset + local)`` of a ``global_batch``-row batch.
    Assembly goes through ``make_array_from_callback`` with the index
    translated into the local block — this supports any mesh layout (view- or
    bev-sharded process meshes included), unlike
    ``make_array_from_process_local_data`` which requires the local data to
    be exactly the process's addressable shard."""
    from mvdetr_tpu.parallel.sharding import batch_shardings

    shardings = batch_shardings(mesh)

    def put(x, s):
        if jax.process_count() == 1:
            return jax.device_put(x, s)
        x = np.asarray(x)
        gshape = (global_batch or x.shape[0],) + x.shape[1:]

        def cb(idx):
            rows = idx[0]
            start = (rows.start or 0) - frame_offset
            stop = rows.stop - frame_offset if rows.stop is not None else None
            return x[(slice(start, stop),) + tuple(idx[1:])]

        return jax.make_array_from_callback(gshape, s, cb)

    return jax.tree.map(put, local_batch, shardings, is_leaf=lambda x: not isinstance(x, dict))
