"""Pretrained-backbone conversion tests (VERDICT #4).

torchvision is not installed here, so the tests synthesize a state_dict with
torchvision's exact key naming/shapes and verify the converted Flax trunk
against an independent torch-functional forward of the same weights — the
structural contract of the reference backbone
(`/root/reference/multiview_detector/models/resnet.py:43-49,172-188` dilation
placement; `models/mvdetr.py:97-104` selection and vgg surgery).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mvdetr_tpu.models import (  # noqa: E402
    ResNetFeatures,
    VGG11Features,
    load_torchvision_state_dict,
    load_torchvision_vgg11_state_dict,
)


def _rand(g, *shape):
    return torch.empty(*shape).normal_(0, 0.05, generator=g)


def make_resnet18_state_dict(seed=0):
    """Random weights under torchvision resnet18 key naming (trunk only)."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def add_bn(prefix, ch):
        sd[f"{prefix}.weight"] = _rand(g, ch).abs() + 0.5
        sd[f"{prefix}.bias"] = _rand(g, ch)
        sd[f"{prefix}.running_mean"] = _rand(g, ch)
        sd[f"{prefix}.running_var"] = _rand(g, ch).abs() + 0.5

    sd["conv1.weight"] = _rand(g, 64, 3, 7, 7)
    add_bn("bn1", 64)
    channels = {1: (64, 64), 2: (64, 128), 3: (128, 256), 4: (256, 512)}
    for stage in range(1, 5):
        cin, cout = channels[stage]
        for block in range(2):
            p = f"layer{stage}.{block}"
            bin_ = cin if block == 0 else cout
            sd[f"{p}.conv1.weight"] = _rand(g, cout, bin_, 3, 3)
            sd[f"{p}.conv2.weight"] = _rand(g, cout, cout, 3, 3)
            add_bn(f"{p}.bn1", cout)
            add_bn(f"{p}.bn2", cout)
            if block == 0 and stage > 1:
                sd[f"{p}.downsample.0.weight"] = _rand(g, cout, cin, 1, 1)
                add_bn(f"{p}.downsample.1", cout)
    return sd


def torch_resnet18_dilated(sd, x):
    """Reference-contract forward: output stride 8, dilation on conv1 only."""

    def bn(x, p):
        return F.batch_norm(x, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
                            sd[f"{p}.weight"], sd[f"{p}.bias"], training=False, eps=1e-5)

    def block(x, p, stride, dil1):
        y = F.conv2d(x, sd[f"{p}.conv1.weight"], stride=stride, padding=dil1, dilation=dil1)
        y = F.relu(bn(y, f"{p}.bn1"))
        y = F.conv2d(y, sd[f"{p}.conv2.weight"], padding=1)
        y = bn(y, f"{p}.bn2")
        if f"{p}.downsample.0.weight" in sd:
            x = bn(F.conv2d(x, sd[f"{p}.downsample.0.weight"], stride=stride), f"{p}.downsample.1")
        return F.relu(y + x)

    x = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    x = F.relu(bn(x, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    # (stage, block0 stride, block0 conv1 dilation, block1 conv1 dilation)
    for stage, stride, d0, d1 in [(1, 1, 1, 1), (2, 2, 1, 1), (3, 1, 1, 2), (4, 1, 2, 4)]:
        x = block(x, f"layer{stage}.0", stride, d0)
        x = block(x, f"layer{stage}.1", 1, d1)
    return x


def test_resnet18_conversion_matches_torch_forward():
    sd = make_resnet18_state_dict()
    variables = load_torchvision_state_dict(sd)
    model = ResNetFeatures()

    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (1, 64, 96, 3)).astype(np.float32)
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    ref = torch_resnet18_dilated(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert out.shape == ref.shape == (1, 8, 12, 512)  # stride 8
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def make_vgg11_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    shapes = [(64, 3), (128, 64), (256, 128), (256, 256), (512, 256), (512, 512), (512, 512), (512, 512)]
    idx = (0, 3, 6, 8, 11, 13, 16, 18)
    sd = {}
    for (cout, cin), t in zip(shapes, idx):
        sd[f"features.{t}.weight"] = _rand(g, cout, cin, 3, 3)
        sd[f"features.{t}.bias"] = _rand(g, cout)
    return sd


def torch_vgg11_surgery(sd, x):
    """vgg11.features with [-1] and [-4] replaced by Identity (`mvdetr.py:97-101`)."""
    idx = (0, 3, 6, 8, 11, 13, 16, 18)
    pool_after = {0, 1, 3, 5}  # conv positions followed by maxpool (last pool removed)
    for i, t in enumerate(idx):
        x = F.conv2d(x, sd[f"features.{t}.weight"], sd[f"features.{t}.bias"], padding=1)
        if i != 6:  # layer 17 (ReLU after conv #16) was replaced by Identity
            x = F.relu(x)
        if i in pool_after:
            x = F.max_pool2d(x, 2, stride=2)
    return x


def test_vgg11_conversion_matches_torch_forward():
    sd = make_vgg11_state_dict()
    variables = load_torchvision_vgg11_state_dict(sd)
    model = VGG11Features()

    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (1, 64, 96, 3)).astype(np.float32)
    out = model.apply({"params": jax.tree.map(jnp.asarray, variables["params"])},
                      jnp.asarray(x), train=False)
    ref = torch_vgg11_surgery(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert out.shape == ref.shape == (1, 4, 6, 512)  # stride 16
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_backbone_ckpt_npz_roundtrip(tmp_path):
    """The CLI's .npz branch: save a synthesized state_dict, load through
    create_train_state, and verify the converted weights landed in params."""
    from mvdetr_tpu.data import FrameDataset, SyntheticScene
    from mvdetr_tpu.geometry import make_synthetic_rig
    from mvdetr_tpu.models import MVDeTr
    from mvdetr_tpu.train import create_train_state

    sd = make_resnet18_state_dict()
    npz_path = tmp_path / "resnet18.npz"
    np.savez(npz_path, **{k: v.numpy() for k, v in sd.items()})

    rig = make_synthetic_rig(num_cam=2, img_shape=(64, 96), worldgrid_shape=(24, 48))
    scene = SyntheticScene(rig, num_frame=2, num_person=3, seed=0)
    ds = FrameDataset(scene, train=True, world_reduce=2, img_reduce=12, top_k=8)
    batch = next(ds.batches(batch_size=1))

    converted = load_torchvision_state_dict(dict(np.load(npz_path)))
    model = MVDeTr.from_rig(rig, world_reduce=2, img_reduce=12, world_feat_arch="conv",
                            bottleneck_dim=32)
    state = create_train_state(model, batch, backbone_variables=converted)
    got = np.asarray(state.params["base"]["conv1"]["kernel"])
    want = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, atol=0)


def test_backbone_ckpt_shape_mismatch_raises(tmp_path):
    from mvdetr_tpu.data import FrameDataset, SyntheticScene
    from mvdetr_tpu.geometry import make_synthetic_rig
    from mvdetr_tpu.models import MVDeTr
    from mvdetr_tpu.train import create_train_state

    sd = make_resnet18_state_dict()
    sd["conv1.weight"] = sd["conv1.weight"][:, :2]  # corrupt a shape
    converted = load_torchvision_state_dict(sd)
    rig = make_synthetic_rig(num_cam=2, img_shape=(64, 96), worldgrid_shape=(24, 48))
    scene = SyntheticScene(rig, num_frame=2, num_person=3, seed=0)
    ds = FrameDataset(scene, train=True, world_reduce=2, img_reduce=12, top_k=8)
    batch = next(ds.batches(batch_size=1))
    model = MVDeTr.from_rig(rig, world_reduce=2, img_reduce=12, world_feat_arch="conv",
                            bottleneck_dim=32)
    with pytest.raises(ValueError, match="does not match"):
        create_train_state(model, batch, backbone_variables=converted)
