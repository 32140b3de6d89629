"""Windowed (dense) deformable attention vs the gather oracle.

Exactness claim: with identity reference points and offsets within the
window, the shifted-window formulation reproduces the gather path
bit-for-bit (up to f32 reassociation)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvdetr_tpu.ops.msda import ms_deform_attn_same_shape
from mvdetr_tpu.ops.msda_windowed import ms_deform_attn_windowed, shift2d


def _identity_locations(offsets_cells, h, w):
    """Convert raw cell offsets into the gather path's normalized locations
    for identity reference points: loc*W - 0.5 == x_q + offset."""
    b, c, hh, ww, m, l, p, _ = offsets_cells.shape
    ys, xs = np.meshgrid(np.arange(hh) + 0.5, np.arange(ww) + 0.5, indexing="ij")
    base = np.stack([xs / ww, ys / hh], -1)  # identity refs, normalized
    loc = base[None, None, :, :, None, None, None, :] + offsets_cells / np.array([ww, hh])
    return loc.reshape(b, c * hh * ww, m, l, p, 2).astype(np.float32)


@pytest.mark.parametrize("radius", [2, 4])
def test_windowed_matches_gather(radius, rng):
    b, l, h, w, m, d, p = 1, 3, 8, 12, 2, 4, 4
    c = l
    value = rng.standard_normal((b, l, h, w, m, d)).astype(np.float32)
    offsets = rng.uniform(-(radius - 1), radius - 1, (b, c, h, w, m, l, p, 2)).astype(np.float32)
    wgt = rng.uniform(0, 1, (b, c, h, w, m, l, p)).astype(np.float32)
    wgt = wgt / wgt.sum(axis=(-1, -2), keepdims=True)

    out_win = ms_deform_attn_windowed(jnp.asarray(value), jnp.asarray(offsets), jnp.asarray(wgt), radius)

    loc = _identity_locations(offsets, h, w)
    v_flat = value.reshape(b, l * h * w, m, d)
    out_gather = ms_deform_attn_same_shape(
        jnp.asarray(v_flat), (h, w), l, jnp.asarray(loc),
        jnp.asarray(wgt.reshape(b, c * h * w, m, l, p)),
    )
    np.testing.assert_allclose(np.asarray(out_win), np.asarray(out_gather), atol=2e-5)


def test_windowed_clamps_out_of_window(rng):
    """Offsets beyond the radius are clamped (documented semantics change),
    not wrapped or dropped."""
    b, l, h, w, m, d, p = 1, 1, 6, 6, 1, 2, 1
    value = rng.standard_normal((b, l, h, w, m, d)).astype(np.float32)
    offsets = np.full((b, 1, h, w, m, l, p, 2), 100.0, dtype=np.float32)  # way out
    wgt = np.ones((b, 1, h, w, m, l, p), dtype=np.float32)
    out = np.asarray(ms_deform_attn_windowed(jnp.asarray(value), jnp.asarray(offsets), jnp.asarray(wgt), 2))
    # clamped to +1.9999 cells: interior cells sample ~2 right/down
    got = out.reshape(h, w, d)[2, 2]
    np.testing.assert_allclose(got, value[0, 0, 4, 4, 0], atol=1e-3)


def test_shift2d():
    x = jnp.arange(16.0).reshape(1, 1, 4, 4)[..., None, None]
    s = np.asarray(shift2d(x, 1, -1)).reshape(4, 4)
    # out[y, x] = in[y+1, x-1]
    assert s[0, 1] == 4.0  # in[1, 0]
    assert s[3, 0] == 0.0  # in[4, -1] out of bounds
    assert s[2, 2] == 13.0  # in[3, 1]


def test_windowed_gradients_finite(rng):
    b, l, h, w, m, d, p = 1, 2, 6, 8, 2, 3, 2
    value = rng.standard_normal((b, l, h, w, m, d)).astype(np.float32)
    offsets = rng.uniform(-2, 2, (b, l, h, w, m, l, p, 2)).astype(np.float32)
    wgt = np.ones((b, l, h, w, m, l, p), dtype=np.float32) / (l * p)

    def f(v, o, w_):
        return jnp.sum(ms_deform_attn_windowed(v, o, w_, 3) ** 2)

    grads = jax.grad(f, argnums=(0, 1, 2))(jnp.asarray(value), jnp.asarray(offsets), jnp.asarray(wgt))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(grads[0]).sum()) > 0


def test_model_auto_selects_windowed():
    from mvdetr_tpu.geometry import make_synthetic_rig
    from mvdetr_tpu.models.world_feat import build_world_feat

    rig = make_synthetic_rig(num_cam=2, img_shape=(48, 96), worldgrid_shape=(32, 64))
    ref4 = np.tile(rig.reference_points(2, 2, 4), (2, 1, 1, 1))
    wf = build_world_feat("deform_trans", 2, (16, 32), base_dim=32, reference_points=ref4)
    assert wf._resolve_mode(8, 16) == "windowed"
    ref8 = np.tile(rig.reference_points(2, 2, 8), (2, 1, 1, 1))
    wf8 = build_world_feat("deform_trans", 2, (16, 32), base_dim=32, reference_points=ref8, n_points=8)
    assert wf8._resolve_mode(8, 16) == "warped"  # 8-point shadow -> shadow-warp fast path
