"""Pallas warp-backward kernel vs the XLA one-hot adjoint and a numpy oracle
(interpret mode on CPU; the TPU path runs the compiled kernel in the bench
harness)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mvdetr_tpu.ops.pallas.warp_bwd import warp_bwd_pallas
from mvdetr_tpu.ops.sampling import bilinear_scatter_matmul


def _oracle(g, sx, sy, h, w):
    """Direct scatter-add of the four bilinear taps (zero-padding semantics)."""
    b, q, c = g.shape
    gv = np.zeros((b, h, w, c), np.float64)
    for bi in range(b):
        for qi in range(q):
            x0, y0 = np.floor(sx[bi, qi]), np.floor(sy[bi, qi])
            wx1, wy1 = sx[bi, qi] - x0, sy[bi, qi] - y0
            for yc, xc, wt in (
                (y0, x0, (1 - wy1) * (1 - wx1)),
                (y0, x0 + 1, (1 - wy1) * wx1),
                (y0 + 1, x0, wy1 * (1 - wx1)),
                (y0 + 1, x0 + 1, wy1 * wx1),
            ):
                if 0 <= xc <= w - 1 and 0 <= yc <= h - 1:
                    gv[bi, int(yc), int(xc)] += wt * g[bi, qi]
    return gv


@pytest.mark.parametrize("qc", [8, 16])
def test_warp_bwd_pallas_matches_oracle(rng, qc):
    b, q, c, h, w = 2, 37, 128, 10, 16
    g = rng.standard_normal((b, q, c)).astype(np.float32)
    # coords spilling outside the image on every side
    sx = rng.uniform(-3, w + 2, (b, q)).astype(np.float32)
    sy = rng.uniform(-3, h + 2, (b, q)).astype(np.float32)

    out = np.asarray(warp_bwd_pallas(
        jnp.asarray(g), jnp.asarray(sx), jnp.asarray(sy), h, w,
        qc=qc, kernel_dtype=jnp.float32, interpret=True,
    ))
    ref = _oracle(g, sx, sy, h, w)
    np.testing.assert_allclose(out, ref, atol=1e-4)

    xla = np.asarray(bilinear_scatter_matmul(jnp.asarray(g), jnp.asarray(sx), jnp.asarray(sy), h, w))
    np.testing.assert_allclose(xla, ref, atol=1e-4)


def test_warp_bwd_pallas_bf16_accumulation(rng):
    """The production bf16 tap weights keep ~2 decimal digits of agreement."""
    b, q, c, h, w = 1, 64, 128, 8, 16
    g = rng.standard_normal((b, q, c)).astype(np.float32)
    sx = rng.uniform(0, w - 1, (b, q)).astype(np.float32)
    sy = rng.uniform(0, h - 1, (b, q)).astype(np.float32)
    out = np.asarray(warp_bwd_pallas(
        jnp.asarray(g), jnp.asarray(sx), jnp.asarray(sy), h, w, qc=16, interpret=True,
    ))
    ref = _oracle(g, sx, sy, h, w)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 2e-2


@pytest.mark.parametrize("spread", ["banded", "fallback", "mixed"])
def test_warp_bwd_pallas_banded_paths(rng, spread):
    """Row banding: chunks whose sy span fits the static band take the
    narrow-window path; wide chunks take the exact full-height fallback.
    Both must reproduce the oracle."""
    b, q, c, h, w, qc, band = 1, 48, 128, 24, 16, 16, 8
    g = rng.standard_normal((b, q, c)).astype(np.float32)
    sx = rng.uniform(-2, w + 1, (b, q)).astype(np.float32)
    if spread == "banded":  # every chunk spans < band rows
        base = rng.uniform(1, h - band + 1, (b, q // qc)).astype(np.float32)
        sy = (np.repeat(base, qc, axis=1) + rng.uniform(0, band - 2, (b, q))).astype(np.float32)
        sy = np.minimum(sy, h - 1.01)
    elif spread == "fallback":  # every chunk spans the full height
        sy = rng.uniform(-2, h + 1, (b, q)).astype(np.float32)
    else:  # alternating chunks
        sy = rng.uniform(-2, h + 1, (b, q)).astype(np.float32)
        sy[:, :qc] = rng.uniform(3, 3 + band - 2, (b, qc))

    out = np.asarray(warp_bwd_pallas(
        jnp.asarray(g), jnp.asarray(sx), jnp.asarray(sy), h, w,
        qc=qc, band=band, kernel_dtype=jnp.float32, interpret=True,
    ))
    ref = _oracle(g, sx, sy, h, w)
    np.testing.assert_allclose(out, ref, atol=1e-4)
