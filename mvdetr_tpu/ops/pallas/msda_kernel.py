"""Pallas TPU kernel for windowed deformable attention (forward).

The XLA formulation of the windowed sampler (`ops/msda_windowed.py`) re-reads
the [Q, M, L, P] offset/weight tensors once per shift — (2R+1)^2 times, ~30 GB
of HBM traffic per call at Wildtrack scale (measured 145 ms). This kernel
tiles queries into VMEM and loops the shifts on-chip, reading every input
exactly once.

Per query tile (TH x TW cells of one query-camera):
1. DMA the halo'd value neighborhood [L, TH+2R, TW+2R, K=M*D] into VMEM
   (once per (i, j) — reused across the C query-camera blocks),
2. for each shift delta (fori_loop):
   - hat weights + attention weights -> cw3 [T, P*L*M] (VPU),
   - per level l: P-sum + level-select via a constant [P*L*M, M] matmul,
     head->channel expansion via a constant [M, K] matmul (both MXU),
   - multiply-accumulate with the shifted value window (VPU).

Channel layouts: value channels are (m-major, d-minor) = K; offset/weight
channels are (p-major, l, m-minor) = PLM so the level/head bookkeeping is
pure matmul — no lane shuffles.

Falls back to the XLA implementation off-TPU or for tile-hostile shapes.
The backward currently reuses the XLA windowed implementation through
``jax.vjp`` (dense, deterministic); a Pallas backward is the next step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _select_matrices(m: int, l: int, p: int, d: int):
    """Sl: [L, PLM, M] p-sum + level-select; Rd: [M, M*D] head->channel."""
    plm = p * l * m
    sl = np.zeros((l, plm, m), dtype=np.float32)
    for pi in range(p):
        for li in range(l):
            for mi in range(m):
                sl[li, pi * l * m + li * m + mi, mi] = 1.0
    rd = np.zeros((m, m * d), dtype=np.float32)
    for mi in range(m):
        rd[mi, mi * d : (mi + 1) * d] = 1.0
    return sl, rd


def _kernel(ox_ref, oy_ref, w_ref, sl_ref, rd_ref, value_ref, out_ref, vtile, sem,
            *, radius, th, tw, vwidth, num_l, num_m, num_d):
    i = pl.program_id(0)
    j = pl.program_id(1)
    c = pl.program_id(2)
    k = num_m * num_d
    t = th * tw
    win = 2 * radius + 1

    @pl.when(c == 0)
    def _():
        # one DMA per level: 3D strided copies are the robust path
        for li in range(num_l):
            dma = pltpu.make_async_copy(
                value_ref.at[li, pl.ds(i * th, th + 2 * radius), pl.ds(j * tw, vwidth), :],
                vtile.at[li],
                sem,
            )
            dma.start()
            dma.wait()

    ox = ox_ref[0].reshape(t, ox_ref.shape[-1])  # [T, PLM]
    oy = oy_ref[0].reshape(t, oy_ref.shape[-1])
    wgt = w_ref[0].reshape(t, w_ref.shape[-1])

    # The y-shift is a dynamic fori index — its slice lands on dim -3 of the
    # value tile, which Mosaic allows. The x-shift must be static: dynamic
    # starts on the sublane (-2) dim fault at runtime, and pltpu.roll in a
    # loop carry hits a Mosaic internal error; a (2R+1)-way static unroll of
    # dx keeps the program ~9x smaller than unrolling both axes.
    def body_dy(dyi, acc):
        haty = jnp.maximum(0.0, 1.0 - jnp.abs(oy - (dyi - radius).astype(jnp.float32)))
        vslab = vtile[:, pl.ds(dyi, th), :, :]  # [L, TH, TW+2R, K]
        for dxi in range(win):
            hatx = jnp.maximum(0.0, 1.0 - jnp.abs(ox - float(dxi - radius)))
            cw3 = wgt * hatx * haty  # [T, PLM]
            for li in range(num_l):
                cwm = jnp.dot(cw3, sl_ref[li], preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)  # [T, M]
                cwk = jnp.dot(cwm, rd_ref[...], preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)  # [T, K]
                vwin = vslab[li, :, dxi : dxi + tw, :]
                acc = acc + cwk * vwin.reshape(t, k).astype(jnp.float32)
        return acc

    acc = jax.lax.fori_loop(0, win, body_dy, jnp.zeros((t, k), jnp.float32))
    out_ref[0] = acc.reshape(th, tw, k)


def _pick_tile(n: int, target: int) -> int:
    for cand in range(min(target, n), 0, -1):
        if n % cand == 0:
            return cand
    return n


def _pick_width_tile(w: int) -> int:
    # Mosaic requires block dims (-2) divisible by 8 or equal to the array dim.
    for cand in (128, 256, 64, 32, 16, 8):
        if w % cand == 0:
            return cand
    return w


def msda_windowed_pallas(
    value: jnp.ndarray,  # [L, H, W, M, D]
    offsets: jnp.ndarray,  # [C, H, W, M, L, P, 2]
    weights: jnp.ndarray,  # [C, H, W, M, L, P]
    radius: int = 4,
    kernel_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Single-batch forward. Returns [C, H, W, M*D] float32."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    l, h, w, m, d = value.shape
    c, _, _, _, _, p = weights.shape
    k = m * d
    plm = p * l * m
    if k % 128 != 0:
        raise ValueError(f"pallas windowed kernel needs M*D % 128 == 0, got {k}")

    # Mosaic constraint: VMEM slice *sizes* on the sublane (-2) dim must be
    # 8-aligned — pad the query width to a multiple of 8 and slice it back off
    # at the end. The value tile gets the halo plus whatever extra padding
    # rounds its width to 8.
    th = _pick_tile(h, 8)
    wp = -(-w // 8) * 8
    tw = wp  # single block across the (padded) width
    vwidth = tw + 2 * radius
    vextra = (-vwidth) % 8
    vwidth += vextra

    vp = jnp.pad(
        value.reshape(l, h, w, k),
        ((0, 0), (radius, radius), (radius, radius + (wp - w) + vextra), (0, 0)),
    ).astype(kernel_dtype)

    def prep(x):  # [C, H, W, M, L, P] -> padded [C, H, Wp, PLM], channel order (p, l, m)
        x = jnp.transpose(x, (0, 1, 2, 5, 4, 3)).reshape(c, h, w, plm).astype(jnp.float32)
        return jnp.pad(x, ((0, 0), (0, 0), (0, wp - w), (0, 0)))

    lim = radius - 1e-4
    ox = prep(jnp.clip(offsets[..., 0], -lim, lim))
    oy = prep(jnp.clip(offsets[..., 1], -lim, lim))
    wg = prep(weights)

    sl, rd = _select_matrices(m, l, p, d)

    grid = (h // th, 1, c)
    qspec = pl.BlockSpec((1, th, tw, plm), lambda i, j, cc: (cc, i, j, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, radius=radius, th=th, tw=tw, vwidth=vwidth, num_l=l, num_m=m, num_d=d),
        out_shape=jax.ShapeDtypeStruct((c, h, wp, k), jnp.float32),
        grid=grid,
        in_specs=[
            qspec,
            qspec,
            qspec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sl
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rd
            pl.BlockSpec(memory_space=pltpu.ANY),  # value (manual DMA)
        ],
        out_specs=pl.BlockSpec((1, th, tw, k), lambda i, j, cc: (cc, i, j, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((l, th + 2 * radius, vwidth, k), kernel_dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(ox, oy, wg, jnp.asarray(sl), jnp.asarray(rd), vp)
    return out[:, :, :w, :]
