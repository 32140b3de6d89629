"""Pallas TPU kernel for windowed deformable attention (forward).

The XLA formulation of the windowed sampler (`ops/msda_windowed.py`) re-reads
the [Q, M, L, P] offset/weight tensors once per shift — (2R+1)^2 times, ~30 GB
of HBM traffic per call at Wildtrack scale (measured 145 ms). This kernel
tiles queries into VMEM and loops the shifts on-chip, reading every input
exactly once.

Structure per query tile (TH x W cells of one query-camera):
1. DMA the halo'd value neighborhood [TH+2R, W+2R, L*K] into VMEM once per
   row-block (reused across the C query-camera blocks),
2. for each shift delta: hat weights -> cw3 [T, P*L*M] (VPU); two constant
   matmuls collapse the P-sum and broadcast (level, head) weights onto the
   fused L*K channel axis (MXU); multiply with the shifted value window and
   reduce the L lane-groups with aligned 128-lane slices (VPU).

Loop shape: the y-shift is a dynamic fori index (dim -3 slices are legal);
the x-shift is a static (2R+1)-way unroll — Mosaic faults on dynamic sublane
starts and `pltpu.roll` in a loop carry ICEs. A fully static unroll of both
axes compiled for tens of minutes; per-(shift, level) micro-matmuls ran at
140 ms — per-shift fused matmuls are the workable point.

The dots run at DEFAULT precision (single MXU pass): only the attention
weights pass through them (~0.4% relative rounding — training noise), the
values never do.

Falls back to the XLA implementation off-TPU or for K % 128 != 0. The
backward runs its own Pallas kernel (`ops/pallas/msda_kernel_bwd.py`) wired
through the ``custom_vjp`` in `ops/msda_windowed.py`.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def vmem_limit_bytes(fraction: float = 0.78) -> int:
    """Per-core VMEM budget derived from the attached device generation
    (v2/v3: 64 MB, v4+/v5e/v6e: 128 MB) instead of hard-coded literals.
    ``MVDETR_VMEM_FRACTION`` overrides (trace-time knob, like the TH tiles) —
    used with larger row tiles that need more scoped VMEM."""
    raw = os.environ.get("MVDETR_VMEM_FRACTION")
    if raw:
        try:
            fraction = float(raw)
        except ValueError:
            import warnings

            warnings.warn(f"MVDETR_VMEM_FRACTION={raw!r} not a float; using {fraction}")
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ""
    total = 64 * 2**20 if ("v2" in kind or "v3" in kind) else 128 * 2**20
    return int(total * fraction)


def _select_matrices(m: int, l: int, p: int, d: int):
    """S: [PLM, LM] p-sum, reading the NATURAL (m, l, p) channel order of a
    flattened ``[..., M, L, P]`` tensor -> (l, m); E: [LM, L*M*D] block
    expansion ((l, m) -> (l, (m, d))). Folding the channel permutation into S
    lets prep ship offsets/weights with a free reshape instead of a
    [B,C,H,W,M,L,P] transpose pass (and the backward emit grads in natural
    order) — that transpose tail measured ~32 ms/step at flagship scale."""
    plm, lm = p * l * m, l * m
    s = np.zeros((plm, lm), dtype=np.float32)
    for pi in range(p):
        for li in range(l):
            for mi in range(m):
                s[mi * l * p + li * p + pi, li * m + mi] = 1.0
    e = np.zeros((lm, l * m * d), dtype=np.float32)
    for li in range(l):
        for mi in range(m):
            e[li * m + mi, (li * m + mi) * d : (li * m + mi + 1) * d] = 1.0
    return s, e


def _select_matrix_fused(m: int, l: int, p: int, d: int) -> np.ndarray:
    """``S @ E`` [PLM, L*M*D] — kept for reference; measured SLOWER than the
    two-step form (fwd 14.2 -> 19.5 ms, bwd 28 -> 37 ms at flagship scale):
    the wider K=PLM pass streams 4x the selection-matrix bytes per shift and
    loses to the skinny-but-cached S/E pair. Do not re-fuse without re-benching
    (BENCH_NOTES.md round 3)."""
    s, e = _select_matrices(m, l, p, d)
    return (s @ e).astype(np.float32)


def _kernel(ox_ref, oy_ref, w_ref, s_ref, e_ref, value_ref, out_ref, vtile, sem,
            *, radius, th, tw, vwidth, num_l, num_m, num_d):
    bb = pl.program_id(0)
    i = pl.program_id(1)
    c = pl.program_id(2)
    k = num_m * num_d
    lk = num_l * k
    t = th * tw
    win = 2 * radius + 1

    @pl.when(c == 0)
    def _():
        dma = pltpu.make_async_copy(
            value_ref.at[bb, pl.ds(i * th, th + 2 * radius), pl.ds(0, vwidth), :],
            vtile,
            sem,
        )
        dma.start()
        dma.wait()

    lim = float(radius)  # clamp in-kernel: prep ships raw offsets
    ox = jnp.clip(ox_ref[0, 0].reshape(t, ox_ref.shape[-1]), -lim, lim)  # [T, PLM]
    oy = jnp.clip(oy_ref[0, 0].reshape(t, oy_ref.shape[-1]), -lim, lim)
    wgt = w_ref[0, 0].reshape(t, w_ref.shape[-1])

    # hatx depends only on the x-shift: compute the (2R+1) columns once
    # instead of once per (dy, dx) pair — the kernel is VPU-bound and this
    # removes most of the per-shift [T, PLM] elementwise work. Above radius 4
    # the precomputed columns exceed the VMEM headroom (ADVICE r2) — recompute
    # per shift instead.
    if win <= 9:
        hatxs = [jnp.maximum(0.0, 1.0 - jnp.abs(ox - float(dxi - radius))) for dxi in range(win)]
    else:
        hatxs = _LazyHats(ox, radius)

    def body_dy(dyi, acc):
        haty = jnp.maximum(0.0, 1.0 - jnp.abs(oy - (dyi - radius).astype(jnp.float32)))
        wy = wgt * haty  # [T, PLM], hoisted out of the x-unroll
        vslab = vtile[pl.ds(dyi, th), :, :]  # [TH, W+2R(+pad), L*K]
        for dxi in range(win):
            cw3 = wy * hatxs[dxi]  # [T, PLM]
            cwlm = jnp.dot(cw3, s_ref[...], preferred_element_type=jnp.float32)  # [T, LM]
            cwlk = jnp.dot(cwlm, e_ref[...], preferred_element_type=jnp.float32)  # [T, L*K]
            vwin = vslab[:, dxi : dxi + tw, :].reshape(t, lk)
            prod = cwlk * vwin.astype(jnp.float32)  # [T, L*K]
            # reduce the L lane-groups (128-aligned static lane slices)
            for li in range(num_l):
                acc = acc + prod[:, li * k : (li + 1) * k]
        return acc

    acc = jax.lax.fori_loop(0, win, body_dy, jnp.zeros((t, k), jnp.float32))
    out_ref[0, 0] = acc.reshape(th, tw, k)


class _LazyHats:
    """hat(ox - dx) computed on demand (large-radius VMEM guard)."""

    def __init__(self, ox, radius):
        self.ox, self.radius = ox, radius

    def __getitem__(self, dxi):
        return jnp.maximum(0.0, 1.0 - jnp.abs(self.ox - float(dxi - self.radius)))


def _kernel_xgrid(ox_ref, oy_ref, w_ref, s_ref, e_ref, value_ref, out_ref,
                  vtile, vsh, sem, sem2, *, radius, th, tw, vwidth,
                  num_l, num_m, num_d):
    """Large-radius variant: the x-shift rides grid axis 3 instead of a
    static (2R+1)-way Python unroll, so compile cost is O(1) in the radius
    (the unroll is what crashes the Mosaic remote compiler at radius >= 12 —
    BENCH_NOTES r4). Mosaic cannot issue vector loads at dynamic sublane
    offsets, and even DMA sublane starts must be PROVABLY 8-divisible — so
    each x-step stages its window with a local VMEM->VMEM copy from the
    8-ALIGNED base below the shift (``pl.multiple_of`` carries the proof)
    and an 8-way static residue unroll supplies the remaining 0..7 column
    offset as a compile-time constant. The halo'd tile is still fetched from
    HBM once per (batch, row-block); the output block is revisited across
    the x-steps and accumulated in place."""
    bb = pl.program_id(0)
    i = pl.program_id(1)
    c = pl.program_id(2)
    dxi = pl.program_id(3)
    k = num_m * num_d
    t = th * tw
    win = 2 * radius + 1

    @pl.when((c == 0) & (dxi == 0))
    def _():
        dma = pltpu.make_async_copy(
            value_ref.at[bb, pl.ds(i * th, th + 2 * radius), pl.ds(0, vwidth), :],
            vtile,
            sem,
        )
        dma.start()
        dma.wait()

    lim = float(radius)
    ox = jnp.clip(ox_ref[0, 0].reshape(t, ox_ref.shape[-1]), -lim, lim)
    oy = jnp.clip(oy_ref[0, 0].reshape(t, oy_ref.shape[-1]), -lim, lim)
    wgt = w_ref[0, 0].reshape(t, w_ref.shape[-1])
    hatx = jnp.maximum(0.0, 1.0 - jnp.abs(ox - (dxi - radius).astype(jnp.float32)))
    wx = wgt * hatx

    for r8 in range(8):

        @pl.when(dxi % 8 == r8)
        def _(r8=r8):
            base = pl.multiple_of(dxi - r8, 8)
            shift = pltpu.make_async_copy(vtile.at[:, pl.ds(base, tw + 8), :], vsh, sem2)
            shift.start()
            shift.wait()

            def body_dy(dyi, acc):
                haty = jnp.maximum(0.0, 1.0 - jnp.abs(oy - (dyi - radius).astype(jnp.float32)))
                cw3 = wx * haty  # [T, PLM]
                cwlm = jnp.dot(cw3, s_ref[...], preferred_element_type=jnp.float32)
                cwlk = jnp.dot(cwlm, e_ref[...], preferred_element_type=jnp.float32)
                vwin = vsh[pl.ds(dyi, th), r8 : r8 + tw, :].reshape(t, num_l * k)
                prod = cwlk * vwin.astype(jnp.float32)
                for li in range(num_l):
                    acc = acc + prod[:, li * k : (li + 1) * k]
                return acc

            acc = jax.lax.fori_loop(0, win, body_dy, jnp.zeros((t, k), jnp.float32))

            @pl.when(dxi == 0)
            def _():
                out_ref[0, 0] = acc.reshape(th, tw, k)

            @pl.when(dxi > 0)
            def _():
                out_ref[0, 0] += acc.reshape(th, tw, k)


def _pick_tile(n: int, target: int) -> int:
    for cand in range(min(target, n), 0, -1):
        if n % cand == 0:
            return cand
    return n


def _env_tile(var: str, default: int) -> int:
    """Row-tile override knob. Read at TRACE time only — set it before the
    first jit of the kernel; changing it later has no effect on warm caches.
    Non-integer values fall back to the default with a warning."""
    raw = os.environ.get(var, str(default))
    try:
        return int(raw)
    except ValueError:
        import warnings

        warnings.warn(f"{var}={raw!r} is not an int; using default {default}")
        return default


def use_xgrid(radius: int) -> bool:
    """Whether the forward uses the grid-axis x-shift kernel (`_kernel_xgrid`)
    — auto above radius 8 (the static unroll's Mosaic wall is radius 12),
    forceable either way with ``MVDETR_MSDA_XGRID=1/0`` for A/B."""
    force = os.environ.get("MVDETR_MSDA_XGRID")
    return (2 * radius + 1) > 17 if force is None else force == "1"


def prep_inputs(value, offsets, weights, radius: int, kernel_dtype=jnp.bfloat16,
                row_halo: bool = False):
    """Shared fwd/bwd kernel-input staging (done ONCE per attention call; the
    custom_vjp saves the prepped arrays as residuals so the backward skips the
    three big transpose passes):

    - ``vp``: value [B, L, Hv, W, M, D] -> channel-fused [B, Hv(+halo),
      Wpad, L*K] in the kernel dtype,
    - ``ox/oy/wg``: [B, C, H, W, M, L, P] -> width-padded [B, C, H, Wp, PLM]
      f32 in the natural (m, l, p) channel order — a free reshape; the
      permutation to (l, m) lives inside the constant S matrix. Offsets stay
      RAW — both kernels clamp (and mask, in the backward) in-kernel.
    """
    b, l, hv, w, m, d = value.shape
    h = hv - 2 * radius if row_halo else hv
    c, p = weights.shape[1], weights.shape[-1]
    k = m * d
    plm = p * l * m

    wp = -(-w // 8) * 8
    vwidth = wp + 2 * radius
    vwidth += (-vwidth) % 8
    if use_xgrid(radius):
        # the grid-axis kernel's aligned-base copy reads up to
        # [2R, 2R + tw + 8) — guarantee the tail columns exist (zero pad)
        vwidth += 8
    vfused = jnp.moveaxis(value.reshape(b, l, hv, w, k), 1, 3).reshape(b, hv, w, l * k)
    ypad = (0, 0) if row_halo else (radius, radius)
    vp = jnp.pad(
        vfused, ((0, 0), ypad, (radius, vwidth - w - radius), (0, 0))
    ).astype(kernel_dtype)

    def prep(x):  # natural (m, l, p) channel order — contiguous flatten
        x = x.reshape(b, c, h, w, plm).astype(jnp.float32)
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, wp - w), (0, 0)))

    return vp, prep(offsets[..., 0]), prep(offsets[..., 1]), prep(weights)


def msda_windowed_pallas(
    value: jnp.ndarray,  # [B, L, H, W, M, D]  (H + 2*radius rows when row_halo)
    offsets: jnp.ndarray,  # [B, C, H, W, M, L, P, 2]
    weights: jnp.ndarray,  # [B, C, H, W, M, L, P]
    radius: int = 4,
    kernel_dtype=jnp.bfloat16,
    row_halo: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Batched forward. Returns [B, C, H, W, M*D] float32; the batch rides a
    grid axis (one value-tile DMA per (batch, row-block), reused across the C
    query cameras).

    ``row_halo``: the value rows already carry a ±radius halo (used by the
    BEV-row-sharded path, `ops/msda_sharded.py` — halo rows come from
    neighboring shards over ICI instead of zero padding), so only the width
    gets padded here.
    """
    m, d, p, w = value.shape[-2], value.shape[-1], weights.shape[-1], value.shape[3]
    vp, ox, oy, wg = prep_inputs(value, offsets, weights, radius, kernel_dtype, row_halo)
    return msda_windowed_pallas_prepped(vp, ox, oy, wg, m=m, d=d, p=p, w=w,
                                        radius=radius, row_halo=row_halo, interpret=interpret)


def msda_windowed_pallas_prepped(
    vp, ox, oy, wg, *, m: int, d: int, p: int, w: int,
    radius: int = 4, row_halo: bool = False, interpret: bool | None = None,
) -> jnp.ndarray:
    """Forward from pre-staged inputs (see :func:`prep_inputs`)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, c, h, wp, plm = ox.shape
    l = plm // (p * m)
    k = m * d
    if k % 128 != 0:
        raise ValueError(f"pallas windowed kernel needs M*D % 128 == 0, got {k}")
    th = _pick_tile(h, _env_tile("MVDETR_MSDA_TH_FWD", 12))
    tw = wp
    vwidth = vp.shape[2]
    win = 2 * radius + 1

    s_mat, e_mat = _select_matrices(m, l, p, d)

    # x-shift placement: static Python unroll up to radius 8 (fastest; the
    # hatx columns are shared across dy), grid axis beyond (the unroll is
    # what crashes the Mosaic remote compiler at radius >= 12 — BENCH_NOTES
    # r4; the grid variant compiles in O(1) of the radius).
    xgrid = use_xgrid(radius)

    if xgrid:
        grid = (b, h // th, c, win)
        qspec = pl.BlockSpec((1, 1, th, tw, plm), lambda bb, i, cc, dx: (bb, cc, i, 0, 0),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((1, 1, th, tw, k), lambda bb, i, cc, dx: (bb, cc, i, 0, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_kernel_xgrid, radius=radius, th=th, tw=tw, vwidth=vwidth,
                                 num_l=l, num_m=m, num_d=d)
        scratch = [
            pltpu.VMEM((th + 2 * radius, vwidth, l * k), vp.dtype),
            pltpu.VMEM((th + 2 * radius, tw + 8, l * k), vp.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
    else:
        grid = (b, h // th, c)
        qspec = pl.BlockSpec((1, 1, th, tw, plm), lambda bb, i, cc: (bb, cc, i, 0, 0),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((1, 1, th, tw, k), lambda bb, i, cc: (bb, cc, i, 0, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_kernel, radius=radius, th=th, tw=tw, vwidth=vwidth,
                                 num_l=l, num_m=m, num_d=d)
        scratch = [
            pltpu.VMEM((th + 2 * radius, vwidth, l * k), vp.dtype),
            pltpu.SemaphoreType.DMA,
        ]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, c, h, wp, k), jnp.float32),
        grid=grid,
        in_specs=[
            qspec,
            qspec,
            qspec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # S
            pl.BlockSpec(memory_space=pltpu.VMEM),  # E
            pl.BlockSpec(memory_space=pl.ANY),  # value (manual DMA)
        ],
        out_specs=ospec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes(0.75)),
        interpret=interpret,
    )(ox, oy, wg, jnp.asarray(s_mat), jnp.asarray(e_mat), vp)
    return out[:, :, :, :w, :]
