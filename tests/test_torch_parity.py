"""Full-model forward parity: reference torch MVDeTr vs the TPU framework.

The strongest checkpoint-interop evidence available without real data: build
the reference model (imported read-only from /root/reference, CPU, pure-torch
attention oracle), randomize its weights, convert its ``state_dict`` with
:mod:`mvdetr_tpu.interop`, and assert the Flax forward reproduces the torch
forward on identical inputs. Covers the deform_trans flagship (with and
without head necks), the conv (MVDet), vanilla-transformer, and aio variants
— i.e. the published ``MultiviewDetector.pth`` checkpoints' full parameter
surface (`/root/reference/multiview_detector/models/mvdetr.py:97-147`).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from mvdetr_tpu.geometry import make_synthetic_rig  # noqa: E402
from mvdetr_tpu.interop import convert_reference_state_dict, detect_reference_config  # noqa: E402
from mvdetr_tpu.models import MVDeTr  # noqa: E402

WORLD_REDUCE, IMG_REDUCE = 2, 8


@pytest.fixture(scope="module")
def ref_mvdetr():
    from tests._reference_torch import import_reference_mvdetr

    return import_reference_mvdetr()


@pytest.fixture(scope="module")
def rig():
    return make_synthetic_rig(num_cam=2, img_shape=(48, 96), worldgrid_shape=(32, 64))


def _randomize(model, seed=3):
    """Perturb every float parameter/buffer so parity exercises nontrivial
    weights (esp. zero-init offsets/attention weights, constant LN scales)."""
    gen = np.random.default_rng(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.from_numpy(gen.normal(0, 0.05, size=tuple(p.shape)).astype(np.float32)))
        for name, buf in model.named_buffers():
            if buf.dtype.is_floating_point:
                noise = torch.from_numpy(gen.normal(0, 0.05, size=tuple(buf.shape)).astype(np.float32))
                if name.endswith("running_var"):
                    buf.copy_((buf + noise.abs()).clamp_min(0.1))
                else:
                    buf.add_(noise)


def _run_pair(ref_mvdetr, rig, world_feat_arch, outfeat_dim, n_points=4):
    shim_cls = __import__("tests._reference_torch", fromlist=["RefDatasetShim"]).RefDatasetShim
    dataset = shim_cls(rig, world_reduce=WORLD_REDUCE, img_reduce=IMG_REDUCE)

    torch.manual_seed(17)
    tmodel = ref_mvdetr.MVDeTr(
        dataset, arch="resnet18", world_feat_arch=world_feat_arch,
        bottleneck_dim=128, outfeat_dim=outfeat_dim, droupout=0.0,
    )
    _randomize(tmodel)
    tmodel.eval()

    if world_feat_arch == "aio":
        # Upstream dead-code bug: the reference 'aio' encoder generates
        # rank-4 reference points (`deformable_transformer.py:30-41`) but
        # MVDeTr's modified MSDeformAttn indexes rank-5 per-point refs
        # (`ms_deform_attn.py:106`) — the variant crashes as shipped. Inject
        # the equivalent per-point grid refs so the torch side runs; the jax
        # side broadcasts the same values from its rank-4 grid refs.
        from mvdetr_tpu.models.deformable import grid_reference_points

        h, w = dataset.Rworld_shape
        ref = grid_reference_points(((h, w),))  # [S, 1, 2]
        ref = np.tile(ref[:, :, None, :], (1, 1, 4, 1)).astype(np.float32)
        tmodel.world_feat.encoder.reference_points = torch.from_numpy(ref)

    sd = tmodel.state_dict()
    cfg = detect_reference_config(sd)
    assert cfg["arch"] == "resnet18"
    assert cfg["world_feat_arch"] == world_feat_arch
    assert cfg["outfeat_dim"] == outfeat_dim
    variables = convert_reference_state_dict(sd, strict=True)

    b, n = 1, rig.num_cam
    h, w = rig.img_shape
    gen = np.random.default_rng(23)
    imgs = gen.normal(0, 1, size=(b, n, 3, h, w)).astype(np.float32)
    affine = np.broadcast_to(np.eye(3, dtype=np.float32), (b, n, 3, 3)).copy()

    with torch.no_grad():
        (t_whm, t_woff), (t_ihm, t_ioff, t_iwh) = tmodel(
            torch.from_numpy(imgs), torch.from_numpy(affine)
        )

    jmodel = MVDeTr.from_rig(
        rig, world_reduce=WORLD_REDUCE, img_reduce=IMG_REDUCE,
        world_feat_arch=world_feat_arch, bottleneck_dim=128, outfeat_dim=outfeat_dim,
        dropout=0.0, n_points=n_points, attn_mode="gather", warp_convention="kornia",
    )
    j_imgs = jnp.asarray(np.moveaxis(imgs, 2, -1))  # NCHW -> NHWC
    (j_whm, j_woff), (j_ihm, j_ioff, j_iwh) = jmodel.apply(
        variables, j_imgs, jnp.asarray(affine), train=False
    )

    def cmp(tt, jj, name):
        want = tt.numpy()
        got = np.moveaxis(np.asarray(jj), -1, 1)  # NHWC -> NCHW
        if want.ndim == 4 and got.shape[0] != want.shape[0]:
            got = got.reshape(want.shape)
        # scale-aware atol: randomized weights inflate activations to ~1e5 in
        # the normalization-free conv variant; f32 reduction-order noise is
        # proportional to that scale
        atol = 2e-3 + 3e-5 * float(np.abs(want).max())
        np.testing.assert_allclose(got, want, atol=atol, rtol=2e-3, err_msg=name)

    cmp(t_whm, j_whm, "world_heatmap")
    cmp(t_woff, j_woff, "world_offset")
    cmp(t_ihm, j_ihm, "imgs_heatmap")
    cmp(t_ioff, j_ioff, "imgs_offset")
    cmp(t_iwh, j_iwh, "imgs_wh")


@pytest.mark.parametrize("outfeat_dim", [0, 32])
def test_deform_trans_full_model_parity(ref_mvdetr, rig, outfeat_dim):
    """The flagship shadow transformer, with and without head necks
    (published runs used both out0 and out64 configs)."""
    _run_pair(ref_mvdetr, rig, "deform_trans", outfeat_dim)


def test_conv_full_model_parity(ref_mvdetr, rig):
    """MVDet configuration (`conv_world_feat.py:21-52`)."""
    _run_pair(ref_mvdetr, rig, "conv", 0)


def test_trans_full_model_parity(ref_mvdetr, rig):
    """Vanilla transformer fusion incl. MultiheadAttention weight repacking."""
    _run_pair(ref_mvdetr, rig, "trans", 0)


def test_aio_full_model_parity(ref_mvdetr, rig):
    """Single-level deformable encoder variant (`trans_world_feat.py:122-154`)."""
    _run_pair(ref_mvdetr, rig, "aio", 0)


def test_deform_conv_full_model_parity(ref_mvdetr, rig):
    """Per-view ``DeformConv2d`` fusion (`conv_world_feat.py:55-76`) — the
    oracle for the converter's (dy, dx)-interleave offset-channel permute
    (`interop.py`) and for `ops/deform_conv.py` itself. torchvision is not
    installed here; the shim provides a clean-room pure-torch DeformConv2d
    following torchvision's documented offset layout (tests/_reference_torch)."""
    _run_pair(ref_mvdetr, rig, "deform_conv", 0)


def test_cli_load_torch_ckpt_eval(ref_mvdetr, rig, tmp_path, monkeypatch):
    """Day-one checkpoint path: ``cli.py --load_torch_ckpt MultiviewDetector.pth``
    converts a (randomized) reference checkpoint and produces a MODA number
    through the full eval pipeline."""
    from tests._reference_torch import RefDatasetShim

    dataset = RefDatasetShim(rig, world_reduce=WORLD_REDUCE, img_reduce=IMG_REDUCE)
    torch.manual_seed(29)
    tmodel = ref_mvdetr.MVDeTr(
        dataset, arch="resnet18", world_feat_arch="deform_trans",
        bottleneck_dim=128, outfeat_dim=0, droupout=0.0,
    )
    ckpt = tmp_path / "MultiviewDetector.pth"
    torch.save(tmodel.state_dict(), str(ckpt))

    monkeypatch.chdir(tmp_path)
    from mvdetr_tpu.cli import main

    trainer = main([
        "-d", "synthetic",
        "--synthetic_cams", "2",
        "--synthetic_frames", "6",
        "--synthetic_img", "48", "96",
        "--synthetic_grid", "32", "64",
        "--world_reduce", "2",
        "--img_reduce", "8",
        "--epochs", "1",
        "--attn_mode", "gather",
        "--load_torch_ckpt", str(ckpt),
    ])
    assert trainer is not None
    logdirs = list((tmp_path / "logs" / "synthetic").iterdir())
    assert (logdirs[0] / "test.txt").exists()

    # config mismatch between flags and checkpoint fails fast with the
    # corrective flags in the message, instead of a deep shape error
    with pytest.raises(SystemExit, match="--outfeat_dim 0"):
        main([
            "-d", "synthetic", "--synthetic_cams", "2", "--synthetic_frames", "6",
            "--synthetic_img", "48", "96", "--synthetic_grid", "32", "64",
            "--world_reduce", "2", "--img_reduce", "8", "--epochs", "1",
            "--attn_mode", "gather", "--outfeat_dim", "32",
            "--load_torch_ckpt", str(ckpt),
        ])

    # auto attn_radius (VERDICT r4 #9): with attn_mode left at 'auto' and no
    # --attn_radius, the CLI scans the checkpoint's offset biases — the fresh
    # radial init reaches 4 cells (rings 1..n_points), so radius 5 is picked —
    # and the windowed fast path evaluates without manual tuning
    trainer = main([
        "-d", "synthetic", "--synthetic_cams", "2", "--synthetic_frames", "6",
        "--synthetic_img", "48", "96", "--synthetic_grid", "32", "64",
        "--world_reduce", "2", "--img_reduce", "8", "--epochs", "1",
        "--load_torch_ckpt", str(ckpt),
    ])
    assert trainer is not None
    from mvdetr_tpu.interop import suggest_attn_radius

    assert suggest_attn_radius(tmodel.state_dict()) == (5, 4.0)


def test_vgg11_conv_checkpoint_converts_and_matches_model_tree(rig):
    """The vgg11 + conv (MVDet) checkpoint layout converts with full key
    coverage and lands exactly on the Flax model's parameter tree (torchvision
    is absent here, so the torch forward can't run — structure parity is the
    testable contract for this arch)."""
    import jax

    gen = np.random.default_rng(13)

    def t(*shape):
        return torch.from_numpy(gen.normal(0, 0.1, size=shape).astype(np.float32))

    sd = {}
    vgg_cfg = [(0, 3, 64), (3, 64, 128), (6, 128, 256), (8, 256, 256),
               (11, 256, 512), (13, 512, 512), (16, 512, 512), (18, 512, 512)]
    for i, cin, cout in vgg_cfg:
        sd[f"base.{i}.weight"] = t(cout, cin, 3, 3)
        sd[f"base.{i}.bias"] = t(cout)
    sd["bottleneck.0.weight"] = t(128, 512, 1, 1)
    sd["bottleneck.0.bias"] = t(128)
    for head, od in (("img_heatmap", 1), ("img_offset", 2), ("img_wh", 2),
                     ("world_heatmap", 1), ("world_offset", 2)):
        sd[f"{head}.0.weight"] = t(od, 128, 1, 1)
        sd[f"{head}.0.bias"] = t(od)
    n = rig.num_cam
    sd["world_feat.downsample.0.weight"] = t(128, 128, 3, 3)
    sd["world_feat.downsample.0.bias"] = t(128)
    sd["world_feat.world_feat.0.weight"] = t(128, 128 * n + 2, 3, 3)
    sd["world_feat.world_feat.0.bias"] = t(128)
    for i in (2, 4):
        sd[f"world_feat.world_feat.{i}.weight"] = t(128, 128, 3, 3)
        sd[f"world_feat.world_feat.{i}.bias"] = t(128)
    sd["world_feat.upsample.1.weight"] = t(128, 128, 3, 3)
    sd["world_feat.upsample.1.bias"] = t(128)

    from mvdetr_tpu.interop import convert_reference_state_dict, detect_reference_config

    cfg = detect_reference_config(sd)
    assert cfg["arch"] == "vgg11" and cfg["world_feat_arch"] == "conv"
    variables = convert_reference_state_dict(sd, strict=True)

    jmodel = MVDeTr.from_rig(
        rig, world_reduce=WORLD_REDUCE, img_reduce=IMG_REDUCE, arch="vgg11",
        world_feat_arch="conv", bottleneck_dim=128, outfeat_dim=0,
    )
    h, w = rig.img_shape
    init = jmodel.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, rig.num_cam, h, w, 3)),
        jnp.broadcast_to(jnp.eye(3), (1, rig.num_cam, 3, 3)),
        train=False,
    )
    want = jax.tree.map(jnp.shape, init["params"])
    got = jax.tree.map(jnp.shape, variables["params"])
    assert want == got


def test_kornia_shim_matches_center_convention_modulo_quirk():
    """Sanity-pin the kornia warp shim against this repo's center-convention
    warp: for the axis-aligned scaling homography the kornia quirk predicts
    sampling at x*W/(W-1) - 0.5, which the 'kornia' warp_convention folds in.
    """
    from mvdetr_tpu.ops.warp import perspective_warp
    from tests._reference_torch import _fake_kornia

    kornia = _fake_kornia()
    gen = np.random.default_rng(5)
    feat = gen.normal(0, 1, size=(1, 12, 20, 3)).astype(np.float32)
    mat = np.array([[[0.8, 0.05, 3.0], [-0.02, 1.1, 1.0], [1e-3, -5e-4, 1.0]]], dtype=np.float32)
    ho, wo = 10, 16

    t = kornia.warp_perspective(
        torch.from_numpy(np.moveaxis(feat, -1, 1)), torch.from_numpy(mat), (ho, wo)
    ).numpy()

    h, w = feat.shape[1:3]
    inv_s = np.array(
        [[(w - 1) / w, 0.0, 0.5 * (w - 1) / w], [0.0, (h - 1) / h, 0.5 * (h - 1) / h], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    out = np.asarray(perspective_warp(jnp.asarray(feat), jnp.asarray(mat @ inv_s), (ho, wo)))
    np.testing.assert_allclose(np.moveaxis(out, -1, 1), t, atol=1e-4)
