"""Pallas windowed-MSDA kernel vs the XLA oracle (interpret mode on CPU;
the same comparison runs on real TPU hardware in the bench harness)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mvdetr_tpu.ops.msda_windowed import ms_deform_attn_windowed, windowed_attention
from mvdetr_tpu.ops.pallas.msda_kernel import msda_windowed_pallas


@pytest.mark.parametrize("radius", [2, 4])
def test_pallas_kernel_matches_xla(radius, rng):
    b, l, h, w, m, d, p, c = 2, 3, 8, 16, 8, 16, 4, 3
    value = rng.standard_normal((b, l, h, w, m, d)).astype(np.float32)
    off = rng.uniform(-(radius - 0.5), radius - 0.5, (b, c, h, w, m, l, p, 2)).astype(np.float32)
    wgt = rng.uniform(0, 1, (b, c, h, w, m, l, p)).astype(np.float32)
    wgt /= wgt.sum(axis=(-1, -2), keepdims=True)

    out = np.asarray(msda_windowed_pallas(
        jnp.asarray(value), jnp.asarray(off), jnp.asarray(wgt), radius,
        kernel_dtype=jnp.float32, interpret=True,
    ))
    ref = np.asarray(ms_deform_attn_windowed(
        jnp.asarray(value), jnp.asarray(off), jnp.asarray(wgt), radius
    )).reshape(b, c, h, w, m * d)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pallas_kernel_nondivisible_width(rng):
    """W=20 is not 8-divisible — exercises the width-padding path."""
    b, l, h, w, m, d, p, c = 1, 2, 4, 20, 8, 16, 2, 2
    value = rng.standard_normal((b, l, h, w, m, d)).astype(np.float32)
    off = rng.uniform(-1.5, 1.5, (b, c, h, w, m, l, p, 2)).astype(np.float32)
    wgt = np.full((b, c, h, w, m, l, p), 1.0 / (l * p), np.float32)
    out = np.asarray(msda_windowed_pallas(
        jnp.asarray(value), jnp.asarray(off), jnp.asarray(wgt), 2,
        kernel_dtype=jnp.float32, interpret=True,
    ))
    ref = np.asarray(ms_deform_attn_windowed(
        jnp.asarray(value), jnp.asarray(off), jnp.asarray(wgt), 2
    )).reshape(b, c, h, w, m * d)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pallas_bwd_matches_xla_vjp(rng):
    """Batched backward kernel vs jax.vjp of the XLA windowed formulation."""
    import jax

    from mvdetr_tpu.ops.pallas.msda_kernel_bwd import msda_windowed_pallas_bwd

    b, l, h, w, m, d, p, c = 2, 2, 6, 16, 8, 16, 2, 2
    radius = 2
    value = jnp.asarray(rng.standard_normal((b, l, h, w, m, d)), jnp.float32)
    off = jnp.asarray(rng.uniform(-1.5, 1.5, (b, c, h, w, m, l, p, 2)), jnp.float32)
    wgt = jnp.asarray(rng.uniform(0, 1, (b, c, h, w, m, l, p)), jnp.float32)
    wgt = wgt / wgt.sum(axis=(-1, -2), keepdims=True)
    g = jnp.asarray(rng.standard_normal((b, c, h, w, m * d)), jnp.float32)

    gv, go, gw = msda_windowed_pallas_bwd(value, off, wgt, g, radius,
                                          kernel_dtype=jnp.float32, interpret=True)
    _, vjp = jax.vjp(lambda v, o, wt: ms_deform_attn_windowed(v, o, wt, radius), value, off, wgt)
    rv, ro, rw = vjp(g.reshape(b, c * h * w, m * d))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=3e-5)
    np.testing.assert_allclose(np.asarray(go), np.asarray(ro), atol=3e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=3e-5)


def test_dispatch_falls_back_on_small_channels(rng):
    """M*D not 128-divisible -> XLA path, transparently."""
    b, l, h, w, m, d, p = 1, 2, 6, 8, 2, 4, 2
    value = rng.standard_normal((b, l, h, w, m, d)).astype(np.float32)
    off = rng.uniform(-1, 1, (b, l, h, w, m, l, p, 2)).astype(np.float32)
    wgt = np.full((b, l, h, w, m, l, p), 1.0 / (l * p), np.float32)
    out = windowed_attention(jnp.asarray(value), jnp.asarray(off), jnp.asarray(wgt), 2)
    assert out.shape == (b, l * h * w, m * d)


def test_pallas_row_halo_matches_xla(rng):
    """row_halo mode (BEV-row-sharded path, `ops/msda_sharded.py`): value rows
    carry a pre-attached ±radius halo; fwd + bwd kernels vs the XLA path."""
    import jax

    from mvdetr_tpu.ops.pallas.msda_kernel_bwd import msda_windowed_pallas_bwd

    b, l, h, w, m, d, p, c = 1, 2, 6, 16, 8, 16, 2, 2
    radius = 2
    value = jnp.asarray(rng.standard_normal((b, l, h + 2 * radius, w, m, d)), jnp.float32)
    off = jnp.asarray(rng.uniform(-1.5, 1.5, (b, c, h, w, m, l, p, 2)), jnp.float32)
    wgt = jnp.asarray(rng.uniform(0, 1, (b, c, h, w, m, l, p)), jnp.float32)
    wgt = wgt / wgt.sum(axis=(-1, -2), keepdims=True)

    from mvdetr_tpu.ops.msda_windowed import ms_deform_attn_windowed

    out = np.asarray(msda_windowed_pallas(
        value, off, wgt, radius, kernel_dtype=jnp.float32, row_halo=True, interpret=True,
    ))
    ref_fn = lambda v, o, wt: ms_deform_attn_windowed(v, o, wt, radius, row_halo=True, flatten=False)
    ref = np.asarray(ref_fn(value, off, wgt))
    np.testing.assert_allclose(out, ref, atol=2e-5)

    g = jnp.asarray(rng.standard_normal((b, c, h, w, m * d)), jnp.float32)
    gv, go, gw = msda_windowed_pallas_bwd(value, off, wgt, g, radius,
                                          kernel_dtype=jnp.float32, row_halo=True, interpret=True)
    _, vjp = jax.vjp(ref_fn, value, off, wgt)
    rv, ro, rw = vjp(g)
    assert gv.shape == value.shape  # halo rows included
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=3e-5)
    np.testing.assert_allclose(np.asarray(go), np.asarray(ro), atol=3e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=3e-5)


def test_pallas_kernel_radius5_lazy_hats(rng):
    """radius 5 exercises the large-radius in-kernel hat recompute guard
    (ADVICE r2) in both directions."""
    import jax

    from mvdetr_tpu.ops.pallas.msda_kernel_bwd import msda_windowed_pallas_bwd

    b, l, h, w, m, d, p, c = 1, 2, 6, 16, 8, 16, 2, 2
    radius = 5
    value = jnp.asarray(rng.standard_normal((b, l, h, w, m, d)), jnp.float32)
    off = jnp.asarray(rng.uniform(-4.5, 4.5, (b, c, h, w, m, l, p, 2)), jnp.float32)
    wgt = jnp.asarray(rng.uniform(0, 1, (b, c, h, w, m, l, p)), jnp.float32)
    wgt = wgt / wgt.sum(axis=(-1, -2), keepdims=True)

    out = np.asarray(msda_windowed_pallas(value, off, wgt, radius,
                                          kernel_dtype=jnp.float32, interpret=True))
    ref = np.asarray(ms_deform_attn_windowed(value, off, wgt, radius)).reshape(b, c, h, w, m * d)
    np.testing.assert_allclose(out, ref, atol=3e-5)

    g = jnp.asarray(rng.standard_normal((b, c, h, w, m * d)), jnp.float32)
    gv, go, gw = msda_windowed_pallas_bwd(value, off, wgt, g, radius,
                                          kernel_dtype=jnp.float32, interpret=True)
    _, vjp = jax.vjp(lambda v, o, wt: ms_deform_attn_windowed(v, o, wt, radius), value, off, wgt)
    rv, ro, rw = vjp(g.reshape(b, c * h * w, m * d))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=5e-5)
    np.testing.assert_allclose(np.asarray(go), np.asarray(ro), atol=5e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=5e-5)


def test_dispatch_pads_non128_head_dim(rng):
    """M*D % 128 != 0 no longer falls off the fast path: the dispatcher
    zero-pads D, runs the kernel, and slices the padding back off."""
    b, l, h, w, m, d, p, c = 1, 2, 4, 16, 8, 12, 2, 2  # M*D = 96
    value = jnp.asarray(rng.standard_normal((b, l, h, w, m, d)), jnp.float32)
    off = jnp.asarray(rng.uniform(-1.5, 1.5, (b, c, h, w, m, l, p, 2)), jnp.float32)
    wgt = jnp.asarray(rng.uniform(0, 1, (b, c, h, w, m, l, p)), jnp.float32)
    wgt = wgt / wgt.sum(axis=(-1, -2), keepdims=True)

    out = np.asarray(windowed_attention(value, off, wgt, 2, use_pallas=True))
    ref = np.asarray(ms_deform_attn_windowed(value, off, wgt, 2))
    # production kernel dtype is bf16 -> compare loosely
    assert np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6) < 2e-2


@pytest.mark.parametrize("radius", [4, 12])
def test_pallas_xgrid_variant_matches_xla(radius, rng, monkeypatch):
    """Large-radius kernel variant (x-shift on a grid axis + dynamic-offset
    local DMA instead of the static unroll that walls the Mosaic compiler at
    radius >= 12). Auto-selected above radius 8; forced here for both radii
    so the A/B path stays covered."""
    monkeypatch.setenv("MVDETR_MSDA_XGRID", "1")
    b, l, h, w, m, d, p, c = 1, 2, 24, 16, 8, 16, 3, 2
    value = rng.standard_normal((b, l, h, w, m, d)).astype(np.float32)
    off = rng.uniform(-radius - 1, radius + 1, (b, c, h, w, m, l, p, 2)).astype(np.float32)
    wgt = rng.uniform(0, 1, (b, c, h, w, m, l, p)).astype(np.float32)
    wgt /= wgt.sum(axis=(-1, -2), keepdims=True)

    out = np.asarray(msda_windowed_pallas(
        jnp.asarray(value), jnp.asarray(off), jnp.asarray(wgt), radius,
        kernel_dtype=jnp.float32, interpret=True,
    ))
    ref = np.asarray(ms_deform_attn_windowed(
        jnp.asarray(value), jnp.asarray(off), jnp.asarray(wgt), radius
    )).reshape(b, c, h, w, m * d)
    np.testing.assert_allclose(out, ref, atol=2e-5)
