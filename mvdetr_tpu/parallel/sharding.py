"""Sharding rules for batches, train state, and jitted steps.

Strategy (SURVEY §2.8 / §7 step 9):

- parameters + optimizer state: replicated (the model is ~20M params — far
  below the per-chip HBM; data parallelism wants replication),
- batch arrays: frame axis over ``data``, camera axis over ``view`` —
  ``imgs [B, N, H, W, 3] -> P('data', 'view')``; world-level targets carry no
  camera axis and shard over ``data`` only,
- intermediates: the model's ``[B*N, ...]`` reshape merges the two sharded
  axes, so per-view backbone/warp compute stays shard-local; the deformable
  encoder's value tensor is all-gathered over ``view`` by XLA SPMD where
  required (annotated via constraint on the warped BEV stack).

Gradient all-reduce and the value all-gather are XLA collectives riding ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_shardings(mesh: Mesh) -> dict:
    """Pytree of NamedShardings matching the FrameDataset batch structure."""
    data_view = NamedSharding(mesh, P("data", "view"))
    data_only = NamedSharding(mesh, P("data"))
    return {
        "imgs": data_view,
        "affine_mats": data_view,
        "frame": data_only,
        "world_gt": {
            "heatmap": data_only, "reg_mask": data_only, "idx": data_only,
            "pid": data_only, "offset": data_only,
        },
        "imgs_gt": {
            "heatmap": data_view, "reg_mask": data_view, "idx": data_view,
            "pid": data_view, "offset": data_view, "wh": data_view,
        },
    }


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    shardings = batch_shardings(mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), batch, shardings,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def make_sharded_train_step(mesh: Mesh, alpha: float = 1.0, use_mse: bool = False):
    """Jit the train step over the mesh: replicated state, (data, view) batch."""
    from mvdetr_tpu.train.trainer import train_step as _step
    import functools

    rep = replicated(mesh)
    state_sh = rep
    batch_sh = batch_shardings(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(state_sh, batch_sh, rep),
        out_shardings=(state_sh, rep),
        donate_argnums=(0,),
    )
    def sharded_train_step(state, batch, rng):
        return _step.__wrapped__(state, batch, rng, alpha, use_mse)

    return sharded_train_step


def make_sharded_eval_step(mesh: Mesh, world_reduce: int = 4, num_candidates: int = 512,
                           alpha: float = 1.0, use_mse: bool = False):
    from mvdetr_tpu.train.trainer import eval_step as _step
    import functools

    rep = replicated(mesh)
    batch_sh = batch_shardings(mesh)

    @functools.partial(jax.jit, in_shardings=(rep, batch_sh), out_shardings=(rep, rep, rep))
    def sharded_eval_step(state, batch):
        return _step.__wrapped__(state, batch, world_reduce, num_candidates, alpha, use_mse, 20.0)

    return sharded_eval_step


def replicate_state(state, mesh: Mesh):
    """Replicate the train state over the mesh. On multi-host runs the mesh
    spans non-addressable devices, so each host contributes its (identical,
    same-seed) local copy via ``make_array_from_process_local_data``."""
    if jax.process_count() == 1:
        return jax.device_put(state, replicated(mesh))
    import numpy as np

    rep = replicated(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)), state
    )
