"""Corner-stencil MSDA formulations vs the 81-shift windowed scan (VERDICT r4 #2).

The ask: the windowed Pallas kernel evaluates all (2R+1)^2 = 81 dense shifts
to realize what is, per tap, a 4-corner bilinear stencil — ~20x padded work at
tap level — so bench an O(L*P) "corner-stencil" formulation (data-dependent
one-hot/selection matmuls built from floor(offset), the warp_bwd trick)
against the O(R^2) scan before calling the scan's floor final.

## Decomposition analysis: every corner formulation reduces to scan or gather

The op: out[t, (m,d)] = sum_{l,p} w[t,mlp] * V_l[i(t)+oy, j(t)+ox, (m,d)]
with (oy, ox) in [-R, R]^2 and bilinear corner weights from floor/frac.
Three corner-sparse candidates:

1. **Per-tap integer gathers** (4 corners x L*P taps, one-hot realized as an
   actual gather): this IS `ops/msda.py::ms_deform_attn_same_shape` — the
   'gather' attention mode. Already built, already measured: 922 ms/layer
   fwd at flagship b=1 vs 29.0 ms windowed (BENCH_NOTES r4). The gather unit
   is a [1, D=16]-lane row per (b, m, q, l, p): 64-byte DMAs, 8 heads x 28
   taps per query, no reuse — HBM-transaction-bound, and the transaction
   count is data-independent. 23x slower than the scan. (A 128-lane row fold
   across M is impossible: heads sample different locations.)

2. **Separable one-hot R/C matmuls over the absolute grid axes** (the
   warp_bwd trick). warp_bwd contracts over the QUERY axis — output is the
   small value grid, queries reduce away, so the one-hot matmul does real
   work. The forward has no reducing axis: a row-gather pass would produce
   Y[t, m, x, d] = sum_r onehot[t,m,r] * V_l[r, x, (m,d)] — the [T, M, W+2R,
   D] intermediate keeps full x-resolution PER QUERY. MACs per (l, p):
   T*M*(H+2R)*(W+2R)*D ≈ 2208*8*68*192*16 ≈ 3.7 G — x28 taps ≈ 103 G MACs
   per tile vs the scan's 11.2 G total (81 * T * (224*56 + 56*896) padded).
   ~10x MORE MXU work before the second (column) pass even starts. Dead on
   arrival; no implementation needed.

3. **Window-local one-hot contraction**: build A[t, s, lm] = sum_p
   w*haty*hatx for every window shift s in [0, 81) (2 nonzero s per tap —
   one-hot by construction), then out[t, k] = sum_s A[t, s, lm(k)] *
   Vwin[t, s, lk]. Two killers: (a) the build evaluates hat at all T*224*81
   (t, tap, shift) combinations — EXACTLY the scan's total hat work, so
   nothing is saved on the VPU; (b) the contraction is t-indexed (each query
   has its own 81-shift value window), so it cannot ride the MXU as a
   matmul; realized in XLA it materializes Vwin = [B, C, H, W, 81, L*K]
   (1.4 TB at flagship — cannot even allocate) or re-gathers per shift
   (= the scan's shifted slices, minus the scan's weight-side factoring).
   This script MEASURES this variant at a reduced scale where the [.., 81,
   L*K] tensor fits, as the numbers-backed closure.

Conclusion shape: per-tap corner sparsity cannot be exploited on TPU without
per-query dynamic addressing (the gather path, transaction-bound) — the
dense-shift scan amortizes the weight-side work across taps (the S/E matmul
factoring) and is the only formulation whose value-side access pattern is
static. The scan's measured 16.4% step MFU is an architectural consequence of
K = L*M = 56 < 128 lanes, not of the 81-vs-4 shift count.

Usage: python scripts/exp_corner_stencil.py [--scale small|mid]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvdetr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def onehot_window_attention_einsum(value, offsets, weights, radius: int):
    """Variant 3, materialized: stack all win^2 shifted windows, build the
    one-hot shift weights, contract with two einsums. Only runs at scales
    where [B, H, W, win^2, L*M*D] fits."""
    b, l, h, w, m, d = value.shape
    c, p = weights.shape[1], weights.shape[-1]
    k = m * d
    win = 2 * radius + 1

    vf = jnp.moveaxis(value.reshape(b, l, h, w, k), 1, 3).reshape(b, h, w, l * k)
    vp = jnp.pad(vf, ((0, 0), (radius, radius), (radius, radius), (0, 0)))
    wins = jnp.stack([
        vp[:, dy : dy + h, dx : dx + w] for dy in range(win) for dx in range(win)
    ], axis=3)  # [B, H, W, win^2, L*K]
    wins = wins.reshape(b, h, w, win * win, l, m, d)

    ox = jnp.clip(offsets[..., 0], -radius, radius)
    oy = jnp.clip(offsets[..., 1], -radius, radius)
    shifts = jnp.arange(win, dtype=ox.dtype) - radius
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(ox[..., None] - shifts))  # [B,C,H,W,M,L,P,win]
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(oy[..., None] - shifts))
    # A[b,c,h,w, s=(dy,dx), m, l] — p-summed one-hot weights
    a = jnp.einsum("bchwmlpy,bchwmlpx,bchwmlp->bchwyxml", hy, hx, weights)
    a = a.reshape(b, c, h, w, win * win, m, l)
    out = jnp.einsum("bchwsml,bhwslmd->bchwmd", a, wins)
    return out.reshape(b, c, h, w, k)


def bench(fn, args, iters=10, name=""):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).ravel()[0])  # value barrier (axon)
    t0 = time.time()
    for _ in range(iters):
        out = jax.jit(fn)(*args)
    float(jnp.asarray(out).ravel()[0])
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="mid", choices=["small", "mid"])
    ap.add_argument("--radius", type=int, default=4)
    args = ap.parse_args()

    from mvdetr_tpu.ops.msda_windowed import ms_deform_attn_windowed, windowed_attention

    r = args.radius
    if args.scale == "small":
        b, l, h, w, m, d, p, c = 1, 3, 16, 24, 2, 8, 3, 3
    else:
        # 1/5-scale flagship in H (memory: wins = 12*180*81*896*4B ≈ 0.6 GB)
        b, l, h, w, m, d, p, c = 1, 7, 12, 180, 8, 16, 4, 7

    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((b, l, h, w, m, d)), jnp.float32)
    off = jnp.asarray(rng.uniform(-r, r, (b, c, h, w, m, l, p, 2)), jnp.float32)
    wgt = jnp.asarray(rng.uniform(0, 1, (b, c, h, w, m, l, p)), jnp.float32)
    wgt = wgt / wgt.sum(axis=(-1, -2), keepdims=True)

    # correctness of the einsum variant vs the scan
    ref = ms_deform_attn_windowed(value, off, wgt, radius=r, flatten=False)
    got = onehot_window_attention_einsum(value, off, wgt, radius=r)
    # TPU lowers the einsum contractions to DEFAULT-precision (bf16-pass) MXU
    # dots; exact-f32 equality is asserted by the CPU small-scale run
    tol = dict(atol=2e-4) if jax.default_backend() == "cpu" else dict(atol=8e-3, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **tol)
    print(f"correctness OK at scale={args.scale} (radius {r})")

    try:
        bench(lambda v, o, g: windowed_attention(v, o, g, radius=r, flatten=False),
              (value, off, wgt), name="windowed scan (Pallas on TPU / XLA on CPU)")
    except Exception as e:  # the mid-scale H=12 tile trips the remote compiler;
        print(f"windowed scan (Pallas): compile failed at this scale ({type(e).__name__}) "
              f"— flagship-scale numbers come from scripts/bench_kernel.py")
    bench(lambda v, o, g: ms_deform_attn_windowed(v, o, g, radius=r, flatten=False),
          (value, off, wgt), name="windowed scan (pure XLA)")
    bench(lambda v, o, g: onehot_window_attention_einsum(v, o, g, radius=r),
          (value, off, wgt), name="corner one-hot einsum (variant 3)")


if __name__ == "__main__":
    main()
