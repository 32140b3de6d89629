"""Pallas TPU kernel for windowed deformable attention (backward).

Same tiling as the forward (`msda_kernel.py`): query row-blocks x cameras,
value neighborhood resident in VMEM. Per shift it recomputes the hat weights
and emits all three cotangents:

- d/d offsets, d/d weights: elementwise hat derivatives against
  ``dcw3 = ((value_window * g) @ E^T) @ S^T`` (two transposed constant
  matmuls). The x-sums factor through per-dy running accumulators
  ``Sx = sum_dx hatx*dcw3`` and ``Sdx = sum_dx dhatx*dcw3`` — the three grads
  are then single per-dy products (``gw += haty*Sx``, ``goy += wdy*Sx``,
  ``gox += wy*Sdx``), cutting the per-shift VPU work ~30 % vs accumulating
  each grad inside the x-unroll.
- d/d value: ``cw * g`` accumulated into a halo'd per-row-block buffer;
  row-blocks overlap by the halo, so each block writes its own padded slab
  and the host overlap-adds them (no cross-block races, fully deterministic —
  the reference resolves the same hazard with CUDA atomicAdd,
  `ms_deform_im2col_cuda.cuh:846-920`).

The offset clip (+ its pass-through mask) runs in-kernel on the raw offsets,
and the three query-side grads leave as ONE packed [..., 3*PLM] tensor — the
XLA pre/epilogue does one transpose pass instead of three plus a masking pass.

The camera grid axis is innermost with a constant output index for the value
cotangent, so the slab stays VMEM-resident and accumulates across cameras.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvdetr_tpu.ops.pallas.msda_kernel import (
    _env_tile, _pick_tile, _select_matrices, prep_inputs, vmem_limit_bytes,
)


def _bwd_kernel(ox_ref, oy_ref, w_ref, g_ref, s_ref, e_ref, st_ref, et_ref, value_ref,
                go_ref, gv_ref, vtile, sem,
                *, radius, th, tw, vwidth, num_l, num_m, num_d):
    bb = pl.program_id(0)
    i = pl.program_id(1)
    c = pl.program_id(2)
    k = num_m * num_d
    lk = num_l * k
    t = th * tw
    win = 2 * radius + 1
    lim = float(radius)

    @pl.when(c == 0)
    def _():
        dma = pltpu.make_async_copy(
            value_ref.at[bb, pl.ds(i * th, th + 2 * radius), pl.ds(0, vwidth), :],
            vtile,
            sem,
        )
        dma.start()
        dma.wait()
        gv_ref[...] = jnp.zeros(gv_ref.shape, gv_ref.dtype)

    ox_raw = ox_ref[0, 0].reshape(t, ox_ref.shape[-1])  # [T, PLM]
    oy_raw = oy_ref[0, 0].reshape(t, oy_ref.shape[-1])
    # clip + pass-through mask in-kernel (`msda_windowed.py:88-89` semantics:
    # grads flow only where the raw offset is inside the window)
    mask_x = (jnp.abs(ox_raw) <= lim).astype(jnp.float32)
    mask_y = (jnp.abs(oy_raw) <= lim).astype(jnp.float32)
    ox = jnp.clip(ox_raw, -lim, lim)
    oy = jnp.clip(oy_raw, -lim, lim)
    wgt = w_ref[0, 0].reshape(t, w_ref.shape[-1])
    g32 = g_ref[0, 0].reshape(t, k).astype(jnp.float32)
    gtile = jnp.concatenate([g32] * num_l, axis=1)  # [T, L*K] f32 (gv accumulate)
    gtile_v = gtile.astype(vtile.dtype)  # kernel-dtype copy for the value-side product

    # x-shift-only factors, computed once for the (2R+1) columns instead of
    # once per (dy, dx) pair (the kernel is VPU-bound; see fwd kernel note).
    # Above radius 4 the 2*(2R+1) [T, PLM] temporaries exceed VMEM headroom
    # (ADVICE r2) — recompute per shift instead.
    if win <= 9:
        hatxs, dhatxs = [], []
        for dxi in range(win):
            ax = jnp.abs(ox - float(dxi - radius))
            hatxs.append(jnp.maximum(0.0, 1.0 - ax))
            dhatxs.append(jnp.where(ax < 1.0, -jnp.sign(ox - float(dxi - radius)), 0.0))
    else:
        hatxs = _LazyHat(ox, radius, False)
        dhatxs = _LazyHat(ox, radius, True)

    def body_dy(dyi, carry):
        gox, goy, gw = carry
        dyf = (dyi - radius).astype(jnp.float32)
        ay = jnp.abs(oy - dyf)
        haty = jnp.maximum(0.0, 1.0 - ay)
        dhaty = jnp.where(ay < 1.0, -jnp.sign(oy - dyf), 0.0)
        wy = wgt * haty  # hoisted per-dy products
        wdy = wgt * dhaty
        vslab = vtile[pl.ds(dyi, th), :, :]
        sx = jnp.zeros_like(ox)  # per-dy running x-sums
        sdx = jnp.zeros_like(ox)
        for dxi in range(win):
            cw3 = wy * hatxs[dxi]  # [T, PLM]
            cwlk = jnp.dot(jnp.dot(cw3, s_ref[...], preferred_element_type=jnp.float32),
                           e_ref[...], preferred_element_type=jnp.float32)  # [T, LK]
            vwin = vslab[:, dxi : dxi + tw, :].reshape(t, lk)  # bf16

            # d value: cw * g, accumulated at the shifted window position
            gv_contrib = (cwlk * gtile).reshape(th, tw, lk).astype(gv_ref.dtype)
            cur = gv_ref[0, 0, pl.ds(dyi, th), dxi : dxi + tw, :]
            gv_ref[0, 0, pl.ds(dyi, th), dxi : dxi + tw, :] = cur + gv_contrib

            # d cw3 back through the two selection matmuls (kernel-dtype
            # product — bf16 in production — f32 accumulation on the MXU)
            dlk = vwin * gtile_v  # [T, LK]
            dcw3 = jnp.dot(jnp.dot(dlk, et_ref[...], preferred_element_type=jnp.float32),
                           st_ref[...], preferred_element_type=jnp.float32)  # [T, PLM]
            sx = sx + hatxs[dxi] * dcw3
            sdx = sdx + dhatxs[dxi] * dcw3
        gw = gw + haty * sx
        goy = goy + wdy * sx
        gox = gox + wy * sdx
        return gox, goy, gw

    zeros = jnp.zeros_like(ox)
    gox, goy, gw = jax.lax.fori_loop(0, win, body_dy, (zeros, zeros, zeros))
    plm = ox_ref.shape[-1]
    packed = jnp.concatenate([gox * mask_x, goy * mask_y, gw], axis=-1)  # [T, 3*PLM]
    go_ref[0, 0] = packed.reshape(th, tw, 3 * plm)


class _LazyHat:
    """hat / dhat columns computed on demand (large-radius VMEM guard)."""

    def __init__(self, ox, radius, deriv):
        self.ox, self.radius, self.deriv = ox, radius, deriv

    def __getitem__(self, dxi):
        delta = self.ox - float(dxi - self.radius)
        if self.deriv:
            return jnp.where(jnp.abs(delta) < 1.0, -jnp.sign(delta), 0.0)
        return jnp.maximum(0.0, 1.0 - jnp.abs(delta))


def msda_windowed_pallas_bwd(
    value: jnp.ndarray,  # [B, L, H, W, M, D]  (H + 2*radius rows when row_halo)
    offsets: jnp.ndarray,  # [B, C, H, W, M, L, P, 2]
    weights: jnp.ndarray,  # [B, C, H, W, M, L, P]
    g: jnp.ndarray,  # [B, C, H, W, K] cotangent of the forward output
    radius: int = 4,
    kernel_dtype=jnp.bfloat16,
    row_halo: bool = False,
    interpret: bool | None = None,
):
    """Returns (g_value, g_offsets, g_weights) with the input shapes; the
    batch rides a grid axis like the forward. With ``row_halo`` the value (and
    its cotangent) carry ±radius extra rows — halo grads flow back to the
    neighbor shards through the ppermute transpose in `ops/msda_sharded.py`."""
    m, d, p, w = value.shape[-2], value.shape[-1], weights.shape[-1], value.shape[3]
    vp, ox, oy, wg = prep_inputs(value, offsets, weights, radius, kernel_dtype, row_halo)
    return msda_windowed_pallas_bwd_prepped(
        vp, ox, oy, wg, g, m=m, d=d, p=p, w=w, radius=radius, row_halo=row_halo,
        out_dtypes=(value.dtype, offsets.dtype, weights.dtype), interpret=interpret,
    )


def msda_windowed_pallas_bwd_prepped(
    vp, ox, oy, wg, g, *, m: int, d: int, p: int, w: int,
    radius: int = 4, row_halo: bool = False, out_dtypes=None,
    interpret: bool | None = None,
):
    """Backward from pre-staged inputs (see `msda_kernel.prep_inputs` — the
    custom_vjp saves them as residuals, so no re-transpose happens here)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, c, h, wp, plm = ox.shape
    l = plm // (p * m)
    hv = h + 2 * radius if row_halo else h
    k = m * d
    if out_dtypes is None:
        out_dtypes = (vp.dtype, jnp.float32, jnp.float32)

    # smaller default than fwd: grad outputs + gv slab share VMEM
    th = _pick_tile(h, _env_tile("MVDETR_MSDA_TH_BWD", 6))
    tw = wp
    vwidth = vp.shape[2]
    gp = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (0, wp - w), (0, 0)))

    s_mat, e_mat = _select_matrices(m, l, p, d)

    n_h = h // th
    grid = (b, n_h, c)
    qspec = pl.BlockSpec((1, 1, th, tw, plm), lambda bb, i, cc: (bb, cc, i, 0, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((1, 1, th, tw, k), lambda bb, i, cc: (bb, cc, i, 0, 0),
                         memory_space=pltpu.VMEM)
    go, gv_blocks = pl.pallas_call(
        functools.partial(_bwd_kernel, radius=radius, th=th, tw=tw, vwidth=vwidth,
                          num_l=l, num_m=m, num_d=d),
        out_shape=(
            jax.ShapeDtypeStruct((b, c, h, wp, 3 * plm), jnp.float32),
            jax.ShapeDtypeStruct((b, n_h, th + 2 * radius, vwidth, l * k), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            qspec, qspec, qspec, gspec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # S
            pl.BlockSpec(memory_space=pltpu.VMEM),  # E
            pl.BlockSpec(memory_space=pltpu.VMEM),  # S^T
            pl.BlockSpec(memory_space=pltpu.VMEM),  # E^T
            pl.BlockSpec(memory_space=pl.ANY),  # value (manual DMA)
        ],
        out_specs=(
            pl.BlockSpec((1, 1, th, tw, 3 * plm), lambda bb, i, cc: (bb, cc, i, 0, 0),
                         memory_space=pltpu.VMEM),
            # constant index over the camera axis: the slab stays resident and
            # accumulates across cameras, written back once per (batch, row-block)
            pl.BlockSpec((1, 1, th + 2 * radius, vwidth, l * k),
                         lambda bb, i, cc: (bb, i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * radius, vwidth, l * k), vp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes(0.78)),
        interpret=interpret,
    )(ox, oy, wg, gp, jnp.asarray(s_mat), jnp.asarray(e_mat),
      jnp.asarray(s_mat.T.copy()), jnp.asarray(e_mat.T.copy()), vp)

    # overlap-add the halo'd row slabs, strip padding, unfuse channels
    gv_full = jnp.zeros((b, h + 2 * radius, vwidth, l * k), jnp.float32)
    for i in range(n_h):
        gv_full = gv_full.at[:, i * th : i * th + th + 2 * radius].add(gv_blocks[:, i])
    # with row_halo the ±radius rows are real (neighbor-shard) rows: keep them
    gv = gv_full[:, :, radius : radius + w, :]
    if not row_halo:
        gv = gv[:, radius : radius + h]
    g_value = jnp.moveaxis(gv.reshape(b, hv, w, l, k), 3, 1).reshape(b, l, hv, w, m, d).astype(out_dtypes[0])

    def unprep(x):  # [B, C, H, Wp, PLM] -> [B, C, H, W, M, L, P] (natural
        # (m, l, p) channel order throughout — no transpose pass)
        return x[:, :, :, :w, :].reshape(b, c, h, w, m, l, p)

    g_off = jnp.stack([unprep(go[..., :plm]), unprep(go[..., plm : 2 * plm])], axis=-1)
    g_wgt = unprep(go[..., 2 * plm :]).astype(out_dtypes[2])
    return g_value, g_off.astype(out_dtypes[1]), g_wgt
