"""Model smoke + structure tests (analogue of the reference's __main__ smoke
tests, `models/mvdetr.py:221-238`, `models/trans_world_feat.py:157-163`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvdetr_tpu.models import MVDeTr, ResNetFeatures, build_world_feat
from mvdetr_tpu.models.deformable import radial_offset_bias


@pytest.fixture(scope="module")
def tiny_rig():
    from mvdetr_tpu.geometry import make_synthetic_rig

    return make_synthetic_rig(num_cam=2, img_shape=(48, 96), worldgrid_shape=(32, 64))


def test_resnet_output_stride():
    m = ResNetFeatures(stage_sizes=(2, 2, 2, 2), replace_stride_with_dilation=(False, True, True))
    x = jnp.zeros((1, 64, 96, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (1, 8, 12, 512)  # output stride 8, 512 channels


@pytest.mark.parametrize("arch", ["conv", "trans", "aio", "deform_trans", "deform_conv"])
def test_world_feat_variants(arch, tiny_rig):
    num_cam, hw = 2, (16, 32)
    ref = None
    if arch == "deform_trans":
        ref = np.tile(tiny_rig.reference_points(world_reduce=2, downsample=2, n_points=4), (num_cam, 1, 1, 1))
    m = build_world_feat(arch, num_cam, hw, base_dim=32, reference_points=ref)
    x = jnp.zeros((1, num_cam, hw[0], hw[1], 32))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (1, hw[0], hw[1], 32)


def test_long_shadow_rig_warns_at_4_points():
    """Geometry-aware clamp-safety check (BENCH_NOTES clamp-stress table): the
    low-camera long-shadow rig must trigger the n_points=8 recommendation;
    flagship-like rigs must not."""
    from mvdetr_tpu.geometry import make_synthetic_rig

    stress = make_synthetic_rig(
        num_cam=4, img_shape=(96, 160), worldgrid_shape=(48, 96),
        camera_height_m=2.0, camera_margin_m=1.0, name="Stress",
    )
    with pytest.warns(UserWarning, match="n_points 8"):
        MVDeTr.from_rig(stress, world_reduce=2, world_feat_arch="deform_trans", n_points=4)

    import warnings as _w

    ok = make_synthetic_rig(num_cam=4, img_shape=(180, 320), worldgrid_shape=(120, 240))
    with _w.catch_warnings():
        _w.simplefilter("error")
        MVDeTr.from_rig(ok, world_reduce=4, world_feat_arch="deform_trans", n_points=4)
        # 8-point and gather configs are clamp-safe by construction on any rig
        MVDeTr.from_rig(stress, world_reduce=2, world_feat_arch="deform_trans", n_points=8)
        MVDeTr.from_rig(stress, world_reduce=2, world_feat_arch="deform_trans",
                        n_points=4, attn_mode="gather")


def test_radial_offset_bias_matches_torch_formula():
    torch = pytest.importorskip("torch")
    import math

    m, l, p = 8, 3, 4
    thetas = torch.arange(m, dtype=torch.float32) * (2.0 * math.pi / m)
    grid = torch.stack([thetas.cos(), thetas.sin()], -1)
    grid = (grid / grid.abs().max(-1, keepdim=True)[0]).view(m, 1, 1, 2).repeat(1, l, p, 1)
    for i in range(p):
        grid[:, :, i, :] *= i + 1
    np.testing.assert_allclose(radial_offset_bias(m, l, p), grid.view(-1).numpy(), atol=1e-5)


def test_mvdetr_forward_shapes(tiny_rig):
    world_reduce, img_reduce = 2, 12
    model = MVDeTr.from_rig(
        tiny_rig, world_reduce=world_reduce, img_reduce=img_reduce, world_feat_arch="deform_trans"
    )
    b, n = 1, tiny_rig.num_cam
    hi = tiny_rig.img_shape[0] * 8 // img_reduce
    wi = tiny_rig.img_shape[1] * 8 // img_reduce
    imgs = jnp.zeros((b, n, hi, wi, 3))
    aff = jnp.broadcast_to(jnp.eye(3), (b, n, 3, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs, aff, train=False)
    (w_hm, w_off), (i_hm, i_off, i_wh) = model.apply(variables, imgs, aff, train=False)
    hw_, ww_ = tiny_rig.Rworld_shape(world_reduce)
    assert w_hm.shape == (b, hw_, ww_, 1)
    assert w_off.shape == (b, hw_, ww_, 2)
    assert i_hm.shape[0] == b * n and i_hm.shape[-1] == 1
    assert i_off.shape[-1] == 2 and i_wh.shape[-1] == 2
    # heatmap bias prior: sigmoid(-2.19) ~ 0.1 at init on zero input
    assert 0.05 < float(jax.nn.sigmoid(w_hm).mean()) < 0.3


def test_mvdetr_train_mode_runs(tiny_rig):
    model = MVDeTr.from_rig(tiny_rig, world_reduce=2, world_feat_arch="conv", dropout=0.5)
    b, n = 1, tiny_rig.num_cam
    imgs = jnp.ones((b, n, 32, 64, 3))
    aff = jnp.broadcast_to(jnp.eye(3), (b, n, 3, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs, aff, train=False)
    out, mutated = model.apply(
        variables,
        imgs,
        aff,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert "batch_stats" in mutated


def test_backbone_params_under_base(tiny_rig):
    model = MVDeTr.from_rig(tiny_rig, world_reduce=2, world_feat_arch="conv")
    imgs = jnp.zeros((1, tiny_rig.num_cam, 32, 64, 3))
    aff = jnp.broadcast_to(jnp.eye(3), (1, tiny_rig.num_cam, 3, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs, aff, train=False)
    assert "base" in variables["params"]
    assert "world_feat" in variables["params"]


def test_backbone_remat_is_exact(tiny_rig):
    """`remat_backbone` must be a pure memory/time trade: same params -> same
    loss and same gradients (rematerialization recomputes identical ops)."""
    kw = dict(world_reduce=2, img_reduce=12, world_feat_arch="conv")
    model = MVDeTr.from_rig(tiny_rig, **kw)
    model_r = MVDeTr.from_rig(tiny_rig, remat_backbone=True, **kw)
    b, n = 1, tiny_rig.num_cam
    hi = tiny_rig.img_shape[0] * 8 // 12
    wi = tiny_rig.img_shape[1] * 8 // 12
    imgs = jax.random.normal(jax.random.PRNGKey(1), (b, n, hi, wi, 3))
    aff = jnp.broadcast_to(jnp.eye(3), (b, n, 3, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs, aff, train=False)

    def loss(m):
        def f(params):
            (w_hm, _), _ = m.apply(
                {**variables, "params": params}, imgs, aff, train=True,
                rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
            )[0]
            return jnp.sum(w_hm ** 2)

        return jax.value_and_grad(f)(variables["params"])

    l0, g0 = loss(model)
    l1, g1 = loss(model_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(lambda a, b_: np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-6), g0, g1)
