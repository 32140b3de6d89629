"""Bilinear sampling primitives shared by the warp and deformable-attention ops.

Convention: integer pixel centers — pixel ``i`` of an axis of size ``W`` is
centered at continuous coordinate ``i``; the valid support is
``[-0.5, W - 0.5]``. This matches ``torch.grid_sample(align_corners=False,
padding_mode='zeros')`` after the affine ``x = g_x * W/2 + (W-1)/2`` and is the
convention of the reference CUDA tap
(`/root/reference/multiview_detector/models/ops/src/cuda/ms_deform_im2col_cuda.cuh:34-84`):
out-of-bounds taps contribute zero, each of the four corners is masked
individually.

All functions are pure jnp and differentiable; gathers lower to XLA gather
(deterministic scatter-add in the backward pass — no atomics).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_gather(flat_value: jnp.ndarray, x, y, h: int, w: int):
    """Sample ``flat_value`` ([..., H*W, C]) at continuous (x, y) pixel coords.

    ``x``/``y`` have identical shapes ``idx_shape``; leading axes of
    ``flat_value`` (if any) must broadcast against ``idx_shape[:k]``. Returns
    ``[..., C]`` with zero padding outside the image.

    The batched form expected by callers is ``flat_value: [B, H*W, C]`` with
    ``x, y: [B, Q]`` -> ``[B, Q, C]``.
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    out = None
    for (yc, xc, wyc, wxc) in (
        (y0, x0, wy0, wx0),
        (y0, x0 + 1.0, wy0, wx1),
        (y0 + 1.0, x0, wy1, wx0),
        (y0 + 1.0, x0 + 1.0, wy1, wx1),
    ):
        inb = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        idx = yi * w + xi
        tap = jnp.take_along_axis(flat_value, idx[..., None], axis=-2)  # [..., Q, C]
        weight = jnp.where(inb, wyc * wxc, 0.0).astype(flat_value.dtype)
        contrib = tap * weight[..., None]
        out = contrib if out is None else out + contrib
    return out


def bilinear_sample_batched(value: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """``value: [B, H, W, C]``, ``x/y: [B, ...]`` -> samples ``[B, ..., C]``."""
    b, h, w, c = value.shape
    flat = value.reshape(b, h * w, c)
    q_shape = x.shape[1:]
    xf = x.reshape(b, -1)
    yf = y.reshape(b, -1)
    out = bilinear_gather(flat, xf, yf, h, w)
    return out.reshape((b,) + q_shape + (c,))
