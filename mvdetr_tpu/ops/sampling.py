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

import jax
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


def bilinear_scatter_matmul(
    g: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, h: int, w: int, chunk: int = 4096
) -> jnp.ndarray:
    """Adjoint of bilinear sampling w.r.t. ``value`` — scatter-free, on the MXU.

    ``g``: [B, Q, C] cotangents of the samples taken at pixel coords
    ``x``/``y``: [B, Q]. Returns ``grad_value`` [B, H, W, C].

    XLA lowers the autodiff transpose of a bilinear gather to scatter-add,
    which serializes on TPU (measured ~1.2 s for the BEV warp at Wildtrack
    scale vs ~10 ms forward). Instead, the bilinear tap weights factor
    exactly per axis: ``w_corner = (wy·inb_y)·(wx·inb_x)``, so

        grad_value[i, j, c] = Σ_q R[q, i] · C[q, j] · g[q, c]

    with ``R`` ([Q, H], two nonzeros per row) and ``C`` ([Q, W]) built by
    comparing floor(y)/floor(x) against an iota — out-of-bounds taps match no
    index and vanish, reproducing zero-padding semantics. The contraction runs
    as two chunked dots (outer-product then matmul over the query axis) that
    ride the MXU with f32 accumulation — deterministic, no atomics, no
    scatter. This is the TPU replacement for the reference backward's
    atomicAdd scatter (`ms_deform_im2col_cuda.cuh:125-152`).
    """
    b, qn, c = g.shape
    chunk = min(chunk, qn)
    nchunk = -(-qn // chunk)
    qp = nchunk * chunk
    if qp != qn:
        g = jnp.pad(g, ((0, 0), (0, qp - qn), (0, 0)))
        # pad coords far out of bounds -> zero weights
        x = jnp.pad(x, ((0, 0), (0, qp - qn)), constant_values=-1e6)
        y = jnp.pad(y, ((0, 0), (0, qp - qn)), constant_values=-1e6)

    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    gs = jnp.moveaxis(g.reshape(b, nchunk, chunk, c), 1, 0)
    xs = jnp.moveaxis(x.reshape(b, nchunk, chunk), 1, 0).astype(jnp.float32)
    ys = jnp.moveaxis(y.reshape(b, nchunk, chunk), 1, 0).astype(jnp.float32)

    def body(acc, inp):
        xx, yy, gg = inp  # [B, CH], [B, CH], [B, CH, C]
        x0 = jnp.floor(xx)
        y0 = jnp.floor(yy)
        wx1 = xx - x0
        wy1 = yy - y0
        # separable one-hot weight matrices; OOB corners match no index
        R = (1.0 - wy1)[..., None] * (rows == y0[..., None]) + wy1[..., None] * (
            rows == (y0 + 1.0)[..., None]
        )  # [B, CH, H]
        C = (1.0 - wx1)[..., None] * (cols == x0[..., None]) + wx1[..., None] * (
            cols == (x0 + 1.0)[..., None]
        )  # [B, CH, W]
        rg = jnp.einsum("bqi,bqc->bqic", R.astype(gg.dtype), gg)  # [B, CH, H, C]
        acc = acc + jax.lax.dot_general(
            C.astype(gg.dtype),
            rg.reshape(b, chunk, h * c),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(b, w, h, c)
        return acc, None

    acc0 = jnp.zeros((b, w, h, c), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (xs, ys, gs))
    return jnp.transpose(acc, (0, 2, 1, 3)).astype(g.dtype)


def bilinear_patch_sample(value: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Patch-gather bilinear sampling: identical math to
    :func:`bilinear_sample_batched` but fetches each query's 2x2 corner patch
    as ONE gather slice from a zero-padded copy — 4x fewer gather descriptors
    forward and 4x fewer scatter descriptors in the autodiff backward, and the
    patch rows are memory-contiguous. Preferred on TPU where gather/scatter
    cost is per-descriptor.

    ``value: [B, H, W, C]``, ``x/y: [B, Q]`` (pixel coords, integer centers)
    -> ``[B, Q, C]`` with zeros outside the image.
    """
    b, h, w, c = value.shape
    q = x.shape[1]
    padded = jnp.pad(value, ((0, 0), (1, 1), (1, 1), (0, 0)))

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = (x - x0).astype(value.dtype)
    wy1 = (y - y0).astype(value.dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    # per-corner in-bounds masks (zero-padding semantics per tap)
    def inb(xc, yc):
        return ((xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)).astype(value.dtype)

    w00 = wy0 * wx0 * inb(x0, y0)
    w01 = wy0 * wx1 * inb(x0 + 1, y0)
    w10 = wy1 * wx0 * inb(x0, y0 + 1)
    w11 = wy1 * wx1 * inb(x0 + 1, y0 + 1)
    weights = jnp.stack([w00, w01, w10, w11], axis=-1).reshape(b, q, 2, 2)

    # patch start in padded coords; clamp keeps far-out queries in range
    # (their weights are already zero)
    ys = jnp.clip(y0 + 1.0, 0, h).astype(jnp.int32)
    xs = jnp.clip(x0 + 1.0, 0, w).astype(jnp.int32)
    starts = jnp.stack([ys, xs], axis=-1)  # [B, Q, 2]

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patches = jax.lax.gather(
        padded, starts, dnums,
        slice_sizes=(1, 2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [B, Q, 2, 2, C]
    return jnp.einsum("bqyx,bqyxc->bqc", weights, patches)
