"""Op-level oracle tests, mirroring the reference's op verification harness
(`models/ops/test.py:32-86`): forward equivalence against an independent
oracle + gradient checks. The oracle here is torch.nn.functional.grid_sample
(align_corners=False, zeros padding), which the reference documents as the
exact semantics of its CUDA kernel (`ms_deform_attn_func.py:41-61`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvdetr_tpu.ops import (
    bilinear_sample_batched,
    ctdet_decode,
    distance_nms,
    heatmap_peaks,
    invert_3x3,
    ms_deform_attn,
    ms_deform_attn_same_shape,
    mvdet_decode,
    perspective_warp,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_grid_sample_oracle(value_nchw, x, y):
    """Sample torch-style: pixel coords with integer centers -> grid_sample."""
    n, c, h, w = value_nchw.shape
    gx = (2 * x + 1) / w - 1
    gy = (2 * y + 1) / h - 1
    grid = torch.stack([gx, gy], dim=-1)  # [N, ..., 2]
    if grid.dim() == 3:
        grid = grid.unsqueeze(2)  # [N, Q, 1, 2]
        out = F.grid_sample(value_nchw, grid, mode="bilinear", padding_mode="zeros", align_corners=False)
        return out.squeeze(-1)  # [N, C, Q]
    return F.grid_sample(value_nchw, grid, mode="bilinear", padding_mode="zeros", align_corners=False)


def test_bilinear_sample_matches_grid_sample(rng):
    b, h, w, c, q = 2, 13, 17, 5, 64
    value = rng.standard_normal((b, h, w, c)).astype(np.float32)
    x = rng.uniform(-3, w + 3, (b, q)).astype(np.float32)
    y = rng.uniform(-3, h + 3, (b, q)).astype(np.float32)

    ours = bilinear_sample_batched(jnp.asarray(value), jnp.asarray(x), jnp.asarray(y))
    t = torch_grid_sample_oracle(
        torch.from_numpy(value).permute(0, 3, 1, 2), torch.from_numpy(x), torch.from_numpy(y)
    )  # [B, C, Q]
    np.testing.assert_allclose(np.asarray(ours), t.permute(0, 2, 1).numpy(), atol=1e-5)


def _random_msda_inputs(rng, b=2, m=3, d=4, p=4, shapes=((6, 9), (5, 7), (4, 4))):
    s = sum(h * w for h, w in shapes)
    l = len(shapes)
    q = 11
    value = rng.standard_normal((b, s, m, d)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, (b, q, m, l, p, 2)).astype(np.float32)
    w = rng.uniform(0, 1, (b, q, m, l * p)).astype(np.float32)
    w = (w / w.sum(-1, keepdims=True)).reshape(b, q, m, l, p)
    return value, loc, w, shapes


def torch_msda_oracle(value, shapes, loc, weights):
    """Independent torch implementation of the §3.4 contract via grid_sample."""
    value_t = torch.from_numpy(value)
    loc_t = torch.from_numpy(loc)
    w_t = torch.from_numpy(weights)
    b, s, m, d = value_t.shape
    _, q, _, l, p, _ = loc_t.shape
    splits = [h * w for h, w in shapes]
    values = value_t.split(splits, dim=1)
    grids = 2 * loc_t - 1
    per_level = []
    for lid, (h, w) in enumerate(shapes):
        v = values[lid].flatten(2).transpose(1, 2).reshape(b * m, d, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # [B*M, Q, P, 2]
        per_level.append(F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False))
    w_f = w_t.transpose(1, 2).reshape(b * m, 1, q, l * p)
    out = (torch.stack(per_level, dim=-2).flatten(-2) * w_f).sum(-1).view(b, m * d, q)
    return out.transpose(1, 2).contiguous().numpy()


def test_msda_matches_torch_oracle(rng):
    value, loc, w, shapes = _random_msda_inputs(rng)
    ours = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    expect = torch_msda_oracle(value, shapes, loc, w)
    np.testing.assert_allclose(np.asarray(ours), expect, atol=1e-5)


def test_msda_same_shape_matches_general(rng):
    shapes = ((6, 9),) * 4
    value, loc, w, shapes = _random_msda_inputs(rng, shapes=shapes)
    general = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    fast = ms_deform_attn_same_shape(jnp.asarray(value), shapes[0], len(shapes), jnp.asarray(loc), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(general), atol=1e-6)
    expect = torch_msda_oracle(value, shapes, loc, w)
    np.testing.assert_allclose(np.asarray(fast), expect, atol=1e-5)


def test_msda_gradients_match_torch(rng):
    """Gradcheck analogue of `models/ops/test.py:63-86`: compare jax grads to a
    torch-autograd oracle in float64-free form (f32, loose tolerance)."""
    value, loc, w, shapes = _random_msda_inputs(rng, b=1, m=2, d=3, p=2, shapes=((5, 6), (4, 4)))

    def f(v, l_, w_):
        return jnp.sum(ms_deform_attn(v, shapes, l_, w_) ** 2)

    gv, gl, gw = jax.grad(f, argnums=(0, 1, 2))(jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    tw = torch.from_numpy(w).requires_grad_(True)
    b, s, m, d = tv.shape
    _, q, _, l, p, _ = tl.shape
    splits = [h_ * w_ for h_, w_ in shapes]
    values = tv.split(splits, dim=1)
    grids = 2 * tl - 1
    per_level = []
    for lid, (h_, w_) in enumerate(shapes):
        v = values[lid].flatten(2).transpose(1, 2).reshape(b * m, d, h_, w_)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        per_level.append(F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False))
    w_f = tw.transpose(1, 2).reshape(b * m, 1, q, l * p)
    out = (torch.stack(per_level, dim=-2).flatten(-2) * w_f).sum(-1).view(b, m * d, q)
    (out.transpose(1, 2) ** 2).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), atol=2e-4)
    # grid_sample's corner-tie subgradient can differ at exact integers; random
    # float locations make ties measure-zero.
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), atol=2e-3)


def test_invert_3x3(rng):
    mats = rng.standard_normal((10, 3, 3)).astype(np.float32) + 3 * np.eye(3, dtype=np.float32)
    inv = np.asarray(invert_3x3(jnp.asarray(mats)))
    np.testing.assert_allclose(inv @ mats, np.broadcast_to(np.eye(3), (10, 3, 3)), atol=1e-4)


def test_perspective_warp_identity(rng):
    feat = rng.standard_normal((2, 12, 18, 4)).astype(np.float32)
    out = perspective_warp(jnp.asarray(feat), jnp.broadcast_to(jnp.eye(3), (2, 3, 3)), (12, 18))
    np.testing.assert_allclose(np.asarray(out), feat, atol=1e-5)


def test_perspective_warp_translation(rng):
    feat = rng.standard_normal((1, 10, 10, 2)).astype(np.float32)
    shift = np.array([[[1.0, 0, 3.0], [0, 1.0, 0], [0, 0, 1.0]]], dtype=np.float32)  # src x -> dst x+3
    out = np.asarray(perspective_warp(jnp.asarray(feat), jnp.asarray(shift), (10, 10)))
    np.testing.assert_allclose(out[:, :, 3:, :], feat[:, :, :7, :], atol=1e-5)
    np.testing.assert_allclose(out[:, :, :3, :], 0.0, atol=1e-6)  # zeros padding


def test_perspective_warp_matches_torch_oracle(rng):
    """Full projective matrix vs a grid_sample oracle."""
    feat = rng.standard_normal((1, 16, 20, 3)).astype(np.float32)
    mat = np.array([[[0.9, 0.1, 2.0], [-0.05, 1.1, -1.0], [1e-3, -2e-3, 1.0]]], dtype=np.float32)
    ho, wo = 14, 22
    out = np.asarray(perspective_warp(jnp.asarray(feat), jnp.asarray(mat), (ho, wo)))

    inv = np.linalg.inv(mat[0])
    ys, xs = np.meshgrid(np.arange(ho, dtype=np.float64), np.arange(wo, dtype=np.float64), indexing="ij")
    pts = np.stack([xs, ys, np.ones_like(xs)], -1) @ inv.T
    sx = (pts[..., 0] / pts[..., 2]).astype(np.float32)
    sy = (pts[..., 1] / pts[..., 2]).astype(np.float32)
    t = torch_grid_sample_oracle(
        torch.from_numpy(feat).permute(0, 3, 1, 2), torch.from_numpy(sx)[None], torch.from_numpy(sy)[None]
    )
    np.testing.assert_allclose(out, t.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_bilinear_scatter_matmul_matches_gather_transpose(rng):
    """The MXU one-hot adjoint must equal the autodiff transpose of the plain
    bilinear gather (including zero-padding at out-of-bounds taps)."""
    from mvdetr_tpu.ops.sampling import bilinear_sample_batched as sample
    from mvdetr_tpu.ops.sampling import bilinear_scatter_matmul

    b, h, w, c, q = 3, 9, 13, 5, 57
    feat = rng.standard_normal((b, h, w, c)).astype(np.float32)
    # coords spanning in-bounds, boundary, and far out-of-bounds
    x = (rng.standard_normal((b, q)) * 8 + 5).astype(np.float32)
    y = (rng.standard_normal((b, q)) * 6 + 3).astype(np.float32)
    g = rng.standard_normal((b, q, c)).astype(np.float32)

    _, vjp = jax.vjp(lambda f: sample(f, jnp.asarray(x), jnp.asarray(y)), jnp.asarray(feat))
    (want,) = vjp(jnp.asarray(g))
    got = bilinear_scatter_matmul(jnp.asarray(g), jnp.asarray(x), jnp.asarray(y), h, w, chunk=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_perspective_warp_grad_matches_plain_autodiff(rng):
    """custom_vjp backward (scatter-free) vs autodiff through the raw gather."""
    from mvdetr_tpu.ops.sampling import bilinear_sample_batched
    from mvdetr_tpu.ops.warp import _warp_coords

    feat = rng.standard_normal((2, 12, 17, 4)).astype(np.float32)
    mat = np.array([[[0.9, 0.1, 2.0], [-0.05, 1.1, -1.0], [1e-3, -2e-3, 1.0]]], dtype=np.float32)
    mats = np.concatenate([mat, np.eye(3, dtype=np.float32)[None]], axis=0)
    out_shape = (10, 15)

    def plain(f):
        sx, sy = _warp_coords(jnp.asarray(mats), out_shape)
        out = bilinear_sample_batched(f, sx.reshape(2, -1), sy.reshape(2, -1))
        return jnp.sum(jnp.sin(out))

    def custom(f):
        return jnp.sum(jnp.sin(perspective_warp(f, jnp.asarray(mats), out_shape).reshape(2, -1, 4)))

    gw = jax.grad(plain)(jnp.asarray(feat))
    gc = jax.grad(custom)(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gw), atol=1e-4)


def _numpy_greedy_nms(points, scores, thres):
    """Transliteration of the reference greedy semantics (`utils/nms.py:30-43`)."""
    order = np.argsort(-scores, kind="stable")
    kept, alive = [], np.ones(len(scores), dtype=bool)
    for i in order:
        if not alive[i]:
            continue
        kept.append(i)
        d = np.linalg.norm(points - points[i], axis=1)
        alive[(d <= thres) & (np.arange(len(scores)) != i) & alive] = False
        # note: only unkept candidates can be suppressed; kept ones stay kept
        alive[i] = False
    keep = np.zeros(len(scores), dtype=bool)
    keep[kept] = True
    return keep


def test_distance_nms_matches_greedy(rng):
    for trial in range(5):
        k = 40
        pts = rng.uniform(0, 30, (k, 2)).astype(np.float32)
        scores = rng.uniform(0, 1, (k,)).astype(np.float32)
        keep = np.asarray(distance_nms(jnp.asarray(pts), jnp.asarray(scores), 5.0))
        expect = _numpy_greedy_nms(pts, scores, 5.0)
        np.testing.assert_array_equal(keep, expect)


def test_distance_nms_valid_mask(rng):
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [100.0, 0.0]], dtype=np.float32)
    scores = np.array([0.9, 0.95, 0.5], dtype=np.float32)
    valid = np.array([True, False, True])
    keep = np.asarray(distance_nms(jnp.asarray(pts), jnp.asarray(scores), 5.0, jnp.asarray(valid)))
    # candidate 1 is invalid: never kept, never suppresses candidate 0
    np.testing.assert_array_equal(keep, [True, False, True])


def test_mvdet_decode(rng):
    b, h, w = 1, 6, 8
    score = rng.uniform(0, 1, (b, h, w, 1)).astype(np.float32)
    offset = rng.uniform(-0.5, 0.5, (b, h, w, 2)).astype(np.float32)
    out = np.asarray(mvdet_decode(jnp.asarray(score), jnp.asarray(offset), reduce=4))
    assert out.shape == (b, h * w, 3)
    cell = 3 * w + 5
    np.testing.assert_allclose(out[0, cell, 0], (5 + offset[0, 3, 5, 0]) * 4, rtol=1e-6)
    np.testing.assert_allclose(out[0, cell, 1], (3 + offset[0, 3, 5, 1]) * 4, rtol=1e-6)
    np.testing.assert_allclose(out[0, cell, 2], score[0, 3, 5, 0], rtol=1e-6)


def test_heatmap_peaks_and_ctdet_decode():
    hm = np.full((1, 9, 9, 1), -6.0, dtype=np.float32)
    hm[0, 2, 3, 0] = 4.0
    hm[0, 2, 4, 0] = 2.0  # adjacent, lower: suppressed by 3x3 peak keep
    hm[0, 7, 7, 0] = 3.0
    peaks = np.asarray(heatmap_peaks(jax.nn.sigmoid(jnp.asarray(hm))))
    assert peaks[0, 2, 4, 0] == 0.0 and peaks[0, 2, 3, 0] > 0.9

    offset = np.zeros((1, 9, 9, 2), dtype=np.float32)
    offset[0, 2, 3] = [0.25, -0.25]
    det = np.asarray(ctdet_decode(jnp.asarray(hm), jnp.asarray(offset), top_k=4))
    assert det.shape == (1, 4, 3)
    np.testing.assert_allclose(det[0, 0, :2], [3.25, 1.75], atol=1e-6)
    np.testing.assert_allclose(det[0, 1, :2], [7.0, 7.0], atol=1e-6)
    assert det[0, 0, 2] > det[0, 1, 2] > det[0, 2, 2]
