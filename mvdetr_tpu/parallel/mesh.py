"""Device mesh construction.

The framework scales over a 3-axis logical mesh:

- ``data``: batch (frame-set) parallelism — gradients all-reduce over ICI/DCN,
- ``view``: camera/view sharding — the reference's 75k-token deformable
  encoder sequence is partitioned by camera (SURVEY §2.8); per-camera
  backbone + warp run shard-local, BEV value features all-gather over ICI,
- ``bev``: BEV-row sharding — for ground grids too large for one chip, the
  query/value H axis is partitioned with a ±radius halo exchange
  (`ops/msda_sharded.py`, SURVEY §2.8 "ring attention" analog).

The reference is strictly single-GPU (`/root/reference/main.py:97-98`); this
layer is new capability, not a port.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    num_view_shards: int = 1,
    num_bev_shards: int = 1,
    devices: Optional[Sequence] = None,
    axis_names=("data", "view", "bev"),
) -> Mesh:
    """Build a (data, view, bev) mesh over ``devices`` (default: all).

    ``num_view_shards`` must divide both the device count and, for exact
    sharding, the camera count; ``num_bev_shards`` must divide the encoder's
    BEV row count. The remaining devices form the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    per = num_view_shards * num_bev_shards
    if n % per != 0:
        raise ValueError(f"{n} devices not divisible into {num_view_shards} view "
                         f"x {num_bev_shards} bev shards")
    grid = np.asarray(devices).reshape(n // per, num_view_shards, num_bev_shards)
    return Mesh(grid, axis_names)
