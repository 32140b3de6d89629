"""Multi-scale deformable attention sampling core.

TPU-native replacement for the reference's CUDA extension
(`/root/reference/multiview_detector/models/ops/src/cuda/ms_deform_im2col_cuda.cuh`).
Numerical contract (see also `models/ops/functions/ms_deform_attn_func.py:41-61`):

    inputs:  value           [B, S, M, D]    S = sum_l H_l * W_l
             spatial_shapes  static tuple of (H_l, W_l)
             sampling_loc    [B, Q, M, L, P, 2]  in [0, 1] per-level coords
             attn_weight     [B, Q, M, L, P]     softmaxed over (L, P) jointly
    output:  out[b,q,m,d] = sum_{l,p} w * bilinear(value_l, x = loc_x*W_l - 0.5,
                                                            y = loc_y*H_l - 0.5)
             reshaped to [B, Q, M*D]

Out-of-bounds taps contribute zero (per-corner masking, `cuh:55-78`).

Design notes (TPU): the op is a weighted gather — there is no dense-matmul
reformulation that doesn't blow up FLOPs, so the fast path keeps the gather in
XLA where its backward is a deterministic scatter-add (no ``atomicAdd`` zoo as
in `cuh:301-920`; TPU reductions are vector-native). ``spatial_shapes`` must
be static so the level loop unrolls at trace time. When all levels share one
shape (the MVDeTr case: one level per camera, identical BEV grids,
`models/trans_world_feat.py:95`), ``ms_deform_attn_same_shape`` folds the
level axis into a single flat gather — one big take instead of L small ones.
"""

from __future__ import annotations

import jax.numpy as jnp

from mvdetr_tpu.ops.sampling import bilinear_gather


def level_start_indices(spatial_shapes) -> tuple:
    """Static prefix offsets of each level in the flattened S axis."""
    starts, acc = [], 0
    for h, w in spatial_shapes:
        starts.append(acc)
        acc += int(h) * int(w)
    return tuple(starts)


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Reference-oracle implementation with per-level gathers.

    Shapes as in the module docstring. ``spatial_shapes`` is a static
    sequence of (H, W) ints. Returns ``[B, Q, M*D]``.
    """
    b, s, m, d = value.shape
    _, q, m2, l, p, _ = sampling_locations.shape
    assert m == m2 and l == len(spatial_shapes)
    assert sum(int(h) * int(w) for h, w in spatial_shapes) == s

    starts = level_start_indices(spatial_shapes)
    # [B, M, Q, ...] layouts so the gather batch dims are (B, M)
    loc = jnp.moveaxis(sampling_locations, 2, 1)  # [B, M, Q, L, P, 2]
    wgt = jnp.moveaxis(attention_weights, 2, 1)  # [B, M, Q, L, P]

    out = jnp.zeros((b, m, q, d), dtype=value.dtype)
    for lid, (h, w) in enumerate(spatial_shapes):
        h, w = int(h), int(w)
        v_l = value[:, starts[lid] : starts[lid] + h * w]  # [B, HW, M, D]
        v_l = jnp.moveaxis(v_l, 2, 1).reshape(b * m, h * w, d)
        x = (loc[:, :, :, lid, :, 0] * w - 0.5).reshape(b * m, q * p)
        y = (loc[:, :, :, lid, :, 1] * h - 0.5).reshape(b * m, q * p)
        taps = bilinear_gather(v_l, x, y, h, w).reshape(b, m, q, p, d)
        out = out + jnp.einsum("bmqpd,bmqp->bmqd", taps, wgt[:, :, :, lid, :])
    return jnp.moveaxis(out, 1, 2).reshape(b, q, m * d)


def ms_deform_attn_same_shape(
    value: jnp.ndarray,
    spatial_shape,
    num_levels: int,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Fast path when all ``num_levels`` levels share ``spatial_shape`` (H, W).

    Folds (level, y, x) into one flat index so all L*P taps issue as a single
    XLA gather per bilinear corner. Matches ``ms_deform_attn`` bit-for-bit on
    same-shape inputs.
    """
    h, w = (int(x) for x in spatial_shape)
    b, s, m, d = value.shape
    _, q, m2, l, p, _ = sampling_locations.shape
    assert m == m2 and l == num_levels and s == l * h * w

    # value -> [B*M, L*H*W, D]
    v = value.reshape(b, l, h * w, m, d)
    v = jnp.moveaxis(v, 3, 1).reshape(b * m, l * h * w, d)

    loc = jnp.moveaxis(sampling_locations, 2, 1)  # [B, M, Q, L, P, 2]
    wgt = jnp.moveaxis(attention_weights, 2, 1).reshape(b * m, q, l * p)
    x = loc[..., 0] * w - 0.5  # [B, M, Q, L, P]
    y = loc[..., 1] * h - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1, wy1 = x - x0, y - y0
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    lvl_off = (jnp.arange(l, dtype=jnp.int32) * (h * w)).reshape(1, 1, 1, l, 1)

    out = jnp.zeros((b * m, q, d), dtype=value.dtype)
    for (yc, xc, wyc, wxc) in (
        (y0, x0, wy0, wx0),
        (y0, x0 + 1.0, wy0, wx1),
        (y0 + 1.0, x0, wy1, wx0),
        (y0 + 1.0, x0 + 1.0, wy1, wx1),
    ):
        inb = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        idx = (lvl_off + yi * w + xi).reshape(b * m, q * l * p)
        taps = jnp.take_along_axis(v, idx[..., None], axis=1).reshape(b * m, q, l * p, d)
        cw = (jnp.where(inb, wyc * wxc, 0.0).astype(value.dtype).reshape(b * m, q, l * p) * wgt)
        out = out + jnp.einsum("sqk,sqkd->sqd", cw, taps)
    return jnp.moveaxis(out.reshape(b, m, q, d), 1, 2).reshape(b, q, m * d)
