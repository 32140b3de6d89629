"""Shadow-warped deformable attention (general reference maps) — oracle tests.

Contract: `ops/msda_warped.py` implements general-reference deformable
attention as shadow-warp (resample each level at its per-point reference map)
followed by identity-windowed sampling with learned offsets on the warped
chart. For identity reference maps this must match the windowed and gather
paths exactly; for general maps it must match the composed jnp oracle
(explicit warp + explicit gather) to float tolerance, forward and backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvdetr_tpu.ops.msda import ms_deform_attn_same_shape
from mvdetr_tpu.ops.msda_warped import ms_deform_attn_warped, shadow_warp_stack
from mvdetr_tpu.ops.msda_windowed import ms_deform_attn_windowed
from mvdetr_tpu.ops.sampling import bilinear_sample_batched


B, L, H, W, M, D, C, P = 1, 3, 12, 20, 2, 4, 3, 4
RADIUS = 3


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(7)
    value = jnp.asarray(rng.normal(0, 1, (B, L, H, W, M, D)), jnp.float32)
    offsets = jnp.asarray(rng.uniform(-RADIUS, RADIUS, (B, C, H, W, M, L, P, 2)), jnp.float32)
    raw_w = rng.normal(0, 1, (B, C, H, W, M, L, P))
    weights = jax.nn.softmax(jnp.asarray(raw_w, jnp.float32).reshape(B, C, H, W, M, L * P), -1)
    weights = weights.reshape(B, C, H, W, M, L, P)
    return value, offsets, weights


def identity_ref():
    ys, xs = np.meshgrid(np.linspace(0.5, H - 0.5, H) / H,
                         np.linspace(0.5, W - 0.5, W) / W, indexing="ij")
    ref = np.stack([xs, ys], -1).reshape(-1, 1, 1, 2)
    return jnp.asarray(np.tile(ref, (1, L, P, 1)), jnp.float32)  # [HW, L, P, 2]


def shadow_ref(scale=0.15, seed=0):
    """Smooth non-identity reference maps (affine-ish per (l, p) displacement)."""
    rng = np.random.default_rng(seed)
    ref = np.asarray(identity_ref()).copy()  # [HW, L, P, 2]
    for li in range(L):
        for pi in range(P):
            a = np.eye(2) + rng.normal(0, scale / 4, (2, 2))
            t = rng.normal(0, scale, 2)
            ref[:, li, pi] = ref[:, li, pi] @ a.T + t
    return jnp.asarray(ref, jnp.float32)


def oracle_warped(value, ref, offsets, weights, radius):
    """Composed jnp oracle: explicit per-(l,p) warp, then explicit windowed
    gather on the warped stack via the gather-path oracle."""
    b, l, h, w, m, d = value.shape
    c = offsets.shape[1]
    p = offsets.shape[6]
    # warp: sample value_l at ref[:, l, p] for every (l, p)
    stacks = []
    for li in range(l):
        for pi in range(p):
            x = ref[:, li, pi, 0] * w - 0.5
            y = ref[:, li, pi, 1] * h - 0.5
            feats = value[:, li].reshape(b, h, w, m * d)
            warped = bilinear_sample_batched(
                feats, jnp.tile(x[None], (b, 1)), jnp.tile(y[None], (b, 1))
            )  # [B, HW, M*D]
            stacks.append(warped.reshape(b, h, w, m, d))
    warped = jnp.stack(stacks, 1)  # [B, L*P, H, W, M, D]
    # identity-windowed sampling expressed through the gather oracle:
    # query (c, y, x) samples warped pseudo-level (l, p) at its own cell
    # center plus the clamped offset
    ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij")
    base = np.tile(np.stack([xs, ys], -1).reshape(1, h * w, 2), (c, 1, 1)).reshape(c * h * w, 2)
    base = jnp.asarray(base, jnp.float32)[None, :, None, None, None, :]  # [1, Q, 1, 1, 1, 2]
    off = jnp.clip(offsets, -float(radius), float(radius))
    off = off.reshape(b, c * h * w, m, l * p, 1, 2)
    loc = (base + off) / jnp.asarray([w, h], jnp.float32)
    wgt = weights.reshape(b, c * h * w, m, l * p, 1)
    v_flat = warped.reshape(b, (l * p) * h * w, m, d)
    return ms_deform_attn_same_shape(v_flat, (h, w), l * p, loc, wgt)


def test_shadow_warp_identity_is_noop(inputs):
    value, _, _ = inputs
    warped = shadow_warp_stack(value, identity_ref())
    assert warped.shape == (B, L * P, H, W, M, D)
    for pi in range(P):
        np.testing.assert_allclose(np.asarray(warped[:, pi::P]), np.asarray(value), atol=1e-5)


def test_warped_equals_windowed_for_identity_refs(inputs):
    value, offsets, weights = inputs
    out_warp = ms_deform_attn_warped(value, identity_ref(), offsets, weights,
                                     radius=RADIUS, use_pallas=False)
    out_win = ms_deform_attn_windowed(value, offsets, weights, radius=RADIUS)
    np.testing.assert_allclose(np.asarray(out_warp), np.asarray(out_win), atol=2e-5)


def test_warped_matches_composed_oracle(inputs):
    value, offsets, weights = inputs
    ref = shadow_ref()
    out = ms_deform_attn_warped(value, ref, offsets, weights, radius=RADIUS, use_pallas=False)
    want = oracle_warped(value, ref, offsets, weights, RADIUS)
    assert out.shape == want.shape == (B, C * H * W, M * D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=3e-5)


def test_warped_gradients_match_oracle(inputs):
    value, offsets, weights = inputs
    ref = shadow_ref()
    g = jnp.asarray(np.random.default_rng(3).normal(0, 1, (B, C * H * W, M * D)), jnp.float32)

    def f_fast(v, o, wt):
        return jnp.vdot(ms_deform_attn_warped(v, ref, o, wt, radius=RADIUS, use_pallas=False), g)

    def f_oracle(v, o, wt):
        return jnp.vdot(oracle_warped(v, ref, o, wt, RADIUS), g)

    gv, go, gw = jax.grad(f_fast, argnums=(0, 1, 2))(value, offsets, weights)
    ov, oo, ow = jax.grad(f_oracle, argnums=(0, 1, 2))(value, offsets, weights)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ov), atol=5e-5)
    np.testing.assert_allclose(np.asarray(go), np.asarray(oo), atol=5e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ow), atol=5e-5)


def test_msdeformattn_warped_mode_runs():
    """MSDeformAttn(mode='warped') end-to-end shape + finiteness."""
    from mvdetr_tpu.models.deformable import MSDeformAttn

    ref = shadow_ref()
    refs_q = jnp.tile(jnp.asarray(ref)[None], (1, C, 1, 1, 1)).reshape(1, C * H * W, L, P, 2)
    attn = MSDeformAttn(d_model=M * D, n_levels=L, n_heads=M, n_points=P,
                        mode="warped", radius=RADIUS)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (1, C * H * W, M * D)), jnp.float32)
    src = jnp.asarray(rng.normal(0, 1, (1, L * H * W, M * D)), jnp.float32)
    variables = attn.init(jax.random.PRNGKey(0), q, refs_q, src, ((H, W),) * L)
    out = attn.apply(variables, q, refs_q, src, ((H, W),) * L)
    assert out.shape == (1, C * H * W, M * D)
    assert bool(jnp.isfinite(out).all())


def test_auto_mode_resolves_warped_for_shadow_refs():
    from mvdetr_tpu.models.world_feat.modules import DeformTransWorldFeat

    ref = np.tile(np.asarray(shadow_ref())[None], (C, 1, 1, 1, 1)).reshape(C * H * W, L, P, 2)
    mod = DeformTransWorldFeat(num_cam=L, world_shape=(2 * H, 2 * W), n_points=P,
                               reference_points=ref, attn_mode="auto")
    assert mod._resolve_mode(H, W) == "warped"
    ident = np.tile(np.asarray(identity_ref())[None], (C, 1, 1, 1, 1)).reshape(C * H * W, L, P, 2)
    mod2 = DeformTransWorldFeat(num_cam=L, world_shape=(2 * H, 2 * W), n_points=P,
                                reference_points=ident, attn_mode="auto")
    assert mod2._resolve_mode(H, W) == "windowed"
