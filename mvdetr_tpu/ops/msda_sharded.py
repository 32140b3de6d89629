"""BEV-row-sharded windowed deformable attention — the long-context story.

SURVEY §2.8: for ground grids too large for one chip, shard the BEV rows
(the query/value H axis) over a mesh axis and exchange only the ±radius
halo rows between neighboring shards. Deformable attention's windowed
sparsity makes the halo tiny (radius=4 rows of [L, W, M*D] ≈ 1.6 MB at
Wildtrack scale vs a 9.7 MB full all-gather) and the exchange is one
bidirectional `ppermute` riding ICI.

Built with `shard_map` so the collective is explicit; edge shards receive
zero halos (ppermute leaves non-permuted targets zero), which matches the
unsharded kernel's zero padding exactly — the equivalence test asserts
bitwise-level agreement with the single-device path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mvdetr_tpu.ops.msda_windowed import windowed_attention


def bev_row_sharded_windowed_attention(
    value: jnp.ndarray,  # [B, L, H, W, M, D]
    offsets: jnp.ndarray,  # [B, C, H, W, M, L, P, 2]
    weights: jnp.ndarray,  # [B, C, H, W, M, L, P]
    mesh,
    radius: int = 4,
    axis: str = "view",
) -> jnp.ndarray:
    """Windowed attention with the BEV H axis sharded over ``mesh[axis]``.

    Requires ``H % n_shards == 0`` and ``H // n_shards >= radius``. Returns
    ``[B, C, H, W, M*D]`` sharded on the H axis.

    Composition over the full 3-axis mesh (SURVEY §2.8 combined strategy):
    when the mesh also carries ``data``/``view`` axes of size > 1, the batch
    stays sharded over ``data`` and the per-camera query blocks (the C axis
    of offsets/weights and of the output) over ``view``, so each device
    computes only its own (frame, camera-block, row-block) cell. The VALUE
    tensor is replicated over ``view`` — every query block samples every
    camera's level, so XLA inserts the documented value all-gather over ICI
    at the shard_map boundary. Only the ±radius row halo moves over ``bev``.
    """
    n = int(mesh.shape[axis])
    h = value.shape[2]
    assert h % n == 0 and h // n >= radius, (h, n, radius)

    fwd = [(j, j + 1) for j in range(n - 1)]  # shard j sends to j+1 (halo from above)
    bwd = [(j + 1, j) for j in range(n - 1)]  # shard j+1 sends to j (halo from below)

    def local(v, o, w):
        # v: [B, L, H_loc, W, M, D] — fetch neighbor halo rows over ICI
        top = jax.lax.ppermute(v[:, :, -radius:], axis, fwd)  # rows above my block
        bot = jax.lax.ppermute(v[:, :, :radius], axis, bwd)  # rows below my block
        vh = jnp.concatenate([top, v, bot], axis=2)
        # per-shard dispatch: Pallas kernels on TPU, dense XLA elsewhere
        return windowed_attention(vh, o, w, radius=radius, row_halo=True, flatten=False)

    mesh_axes = dict(mesh.shape)
    # batch over data only when divisible (the trainer's unsharded ragged-tail
    # fallback can pass a short batch through a mesh-built model)
    data = ("data" if mesh_axes.get("data", 1) > 1
            and value.shape[0] % mesh_axes["data"] == 0 else None)
    # camera-copy query blocks ride the view axis when it is a real axis
    # DISTINCT from the bev axis (the bev-only path historically reuses the
    # name "view" for its row axis) and it divides the C blocks
    view = None
    if axis != "view" and mesh_axes.get("view", 1) > 1 and offsets.shape[1] % mesh_axes["view"] == 0:
        view = "view"
    vspec = P(data, None, axis)  # value: all levels on every view shard
    qspec = P(data, view, axis)  # offsets / weights / output
    return jax.shard_map(
        local, mesh=mesh, in_specs=(vspec, qspec, qspec), out_specs=qspec, check_vma=False,
    )(value, offsets, weights)
