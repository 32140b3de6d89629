"""Pallas TPU kernel for the bilinear-warp backward (grad w.r.t. values).

The XLA formulation (`ops/sampling.py:bilinear_scatter_matmul`) materializes a
[B, chunk, H, C] outer-product intermediate in HBM per scan step (~0.9 GB of
traffic per chunk at flagship scale) — measured 24.5 ms for the BEV warp
backward. This kernel keeps everything in VMEM: the [W, H*C] gradient
accumulator stays resident across query chunks (constant output index map) and
each chunk does one one-hot build (VPU) plus one MXU contraction.

Math (identical to `bilinear_scatter_matmul`, which mirrors the reference's
atomicAdd scatter `ms_deform_im2col_cuda.cuh:125-152`):

    grad_value[i, j, c] = sum_q R[q, i] * C[q, j] * g[q, c]

with R ([Q, H]) and C ([Q, W]) the separable bilinear one-hot weights built by
comparing floor(y)/floor(x) against an iota; out-of-bounds taps match no index
and vanish (zero-padding semantics). The R-side outer product rides the VPU
(H < W, so the smaller axis pays the build); the Q-contraction rides the MXU
in bf16 with f32 accumulation — deterministic, no atomics, no scatter.

Row banding: queries arrive in BEV raster order and the warp is a smooth
homography, so a chunk of consecutive queries samples a narrow band of source
rows. Each chunk computes its live row range in-kernel; if it fits a static
``band`` window the one-hot/contraction shrink from H to ``band`` rows
(~3x fewer FLOPs) and the update lands at a dynamic 128-aligned lane offset of
the accumulator. Chunks whose span exceeds the band (steeply-angled rows,
extreme augmentation) take the exact full-height fallback — both paths are
predicated (`pl.when`), so correctness never depends on the geometry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvdetr_tpu.ops.pallas.msda_kernel import vmem_limit_bytes


def _kernel(g_ref, coord_ref, out_ref, acc, *, h, w, c, qc, band, kdtype):
    nq = pl.num_programs(1)
    q = pl.program_id(1)

    @pl.when(q == 0)
    def _():
        acc[...] = jnp.zeros(acc.shape, acc.dtype)

    sx = coord_ref[0, :, 0:1]  # [QC, 1] f32
    sy = coord_ref[0, :, 1:2]
    g = g_ref[0]  # [QC, C]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx1 = sx - x0
    wy1 = sy - y0
    # int compares (tpu.iota only produces integers); clamp the -1e6 padding
    # sentinel into int32 range, where it still matches no index
    x0i = jnp.clip(x0, -2.0, float(w) + 2.0).astype(jnp.int32)  # -2 -> taps {-2,-1}: no match
    y0i = jnp.clip(y0, -2.0, float(h) + 2.0).astype(jnp.int32)

    cols = jax.lax.broadcasted_iota(jnp.int32, (qc, w), 1)
    c1h = ((cols == x0i) * (1.0 - wx1) + (cols == x0i + 1) * wx1).astype(kdtype)  # [QC, W]

    # live row range of this chunk (taps land on rows [y0i, y0i+1])
    live = (y0i >= -1) & (y0i <= h - 1)
    lo = jnp.min(jnp.where(live, y0i, h))
    hi = jnp.max(jnp.where(live, y0i + 1, 0))
    r0 = jnp.clip(jnp.minimum(lo, hi - band + 1), 0, max(h - band, 0))
    banded = (band < h) & (jnp.maximum(lo, 0) >= r0) & (jnp.minimum(hi, h - 1) < r0 + band)

    def contribution(rows, y0c, nrows):
        r1h = (rows == y0c) * (1.0 - wy1) + (rows == y0c + 1) * wy1  # [QC, nrows] f32
        # outer product in f32 (Mosaic only supports minor-dim insertion on
        # 32-bit lanes), cast to the kernel dtype for the MXU contraction
        rg = (r1h[:, :, None] * g.astype(jnp.float32)[:, None, :]).reshape(qc, nrows * c).astype(kdtype)
        # contract the query axis: [W, QC] x [QC, nrows*C], f32 accumulate
        return jax.lax.dot_general(
            c1h, rg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(banded)
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (qc, band), 1) + r0
        start = pl.multiple_of(r0 * c, 128)
        acc[:, pl.ds(start, band * c)] += contribution(rows, y0i, band)

    @pl.when(jnp.logical_not(banded))
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (qc, h), 1)
        acc[...] += contribution(rows, y0i, h)

    @pl.when(q == nq - 1)
    def _():
        out_ref[0] = jnp.transpose(acc[...].reshape(w, h, c), (1, 0, 2)).astype(out_ref.dtype)


def warp_bwd_pallas(
    g: jnp.ndarray,  # [B, Q, C] sample cotangents
    sx: jnp.ndarray,  # [B, Q] source-pixel x coords
    sy: jnp.ndarray,  # [B, Q]
    h: int,
    w: int,
    qc: int = 128,
    band: int = 32,
    kernel_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns ``grad_value`` [B, h, w, C] in ``g.dtype``."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, qn, c = g.shape
    band = min(band, h)
    qp = -(-qn // qc) * qc
    if qp != qn:
        g = jnp.pad(g, ((0, 0), (0, qp - qn), (0, 0)))
        sx = jnp.pad(sx, ((0, 0), (0, qp - qn)), constant_values=-1e6)
        sy = jnp.pad(sy, ((0, 0), (0, qp - qn)), constant_values=-1e6)
    # coords ride one [B, Qp, 2] f32 array (a full-size last dim satisfies the
    # Mosaic block-tiling rule; a bare [B, Q] vector does not)
    coords = jnp.stack([sx.astype(jnp.float32), sy.astype(jnp.float32)], axis=-1)

    grid = (b, qp // qc)
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, c=c, qc=qc, band=band, kdtype=kernel_dtype),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), g.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qc, c), lambda bb, qq: (bb, qq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qc, 2), lambda bb, qq: (bb, qq, 0), memory_space=pltpu.VMEM),
        ],
        # constant index over the query axis: the block stays VMEM-resident and
        # is written once per batch element, after the last chunk
        out_specs=pl.BlockSpec((1, h, w, c), lambda bb, qq: (bb, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((w, h * c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes(0.78)),
        interpret=interpret,
    )(g, coords)
    return out
