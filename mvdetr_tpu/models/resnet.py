"""ResNet backbone (Flax, NHWC) with stride-to-dilation replacement.

Structural contract from the reference's torchvision-derived backbone
(`/root/reference/multiview_detector/models/resnet.py`), as instantiated with
``replace_stride_with_dilation=[False, True, True]`` (`models/mvdetr.py:103-104`)
for an output stride of 8:

- stem: 7x7/2 conv + BN + ReLU + 3x3/2 maxpool,
- layer1: 64ch stride 1; layer2: 128ch stride 2;
- layer3/layer4: stride folded into dilation. Per `resnet.py:172-188` the
  *first* block of a dilated stage carries the previous stage's dilation on
  its first conv, later blocks the doubled one, and (BasicBlock quirk,
  `resnet.py:43-49`) only ``conv1`` of each block is dilated — ``conv2``
  always has dilation 1.

BatchNorm statistics are computed over the flattened (batch * num_views) axis
by the caller, preserving the reference's B*N batch-stat behavior
(`models/mvdetr.py:153,177`).

``load_torchvision_state_dict`` converts torchvision ``resnet18`` weights
(OIHW -> HWIO) for ImageNet initialization when a checkpoint is available;
zero-egress environments fall back to He-normal initialization.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation_conv1: int = 1
    use_projection: bool = False
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); params stay f32

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name
        )
        identity = x
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(self.dilation_conv1,) * 2] * 2,
            kernel_dilation=(self.dilation_conv1, self.dilation_conv1),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = norm("bn2")(y)
        if self.use_projection:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride), use_bias=False,
                dtype=self.dtype, name="downsample_conv"
            )(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNetFeatures(nn.Module):
    """ResNet-{18,34} feature trunk (no avgpool/fc), NHWC in/out."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    replace_stride_with_dilation: Sequence[bool] = (False, True, True)
    dtype: object = None
    # Rematerialize each residual block on the backward pass instead of
    # keeping its activations in HBM. The trunk's activations dominate the
    # step's live memory (28 views x 360x640x64 at the stem), so this is the
    # lever that lets larger per-chip batches scale (BENCH_NOTES.md batch-4
    # regression).
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = nn.remat(BasicBlock, static_argnums=(2,)) if self.remat else BasicBlock

        dilation = 1
        features = 64
        in_features = 64
        for stage, blocks in enumerate(self.stage_sizes):
            stride = 1 if stage == 0 else 2
            previous_dilation = dilation
            if stage > 0 and self.replace_stride_with_dilation[stage - 1]:
                dilation *= stride
                stride = 1
            for block in range(blocks):
                first = block == 0
                x = block_cls(
                    features=features,
                    stride=stride if first else 1,
                    dilation_conv1=previous_dilation if first else dilation,
                    use_projection=first and (stride != 1 or in_features != features),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train)
            in_features = features
            features *= 2
        return x  # [B, H/8, W/8, 512] with the default dilation config


def resnet18_features() -> ResNetFeatures:
    return ResNetFeatures(stage_sizes=(2, 2, 2, 2), replace_stride_with_dilation=(False, True, True))


# ---------------------------------------------------------------- conversion
def load_torchvision_state_dict(state_dict) -> dict:
    """Convert a torchvision ``resnet18`` state_dict to this module's params.

    Returns ``{"params": ..., "batch_stats": ...}`` pytrees matching
    ``ResNetFeatures``. Accepts either tensors or numpy arrays as values.
    """

    def arr(key):
        v = state_dict[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return jnp.asarray(v)

    def conv(key):
        return jnp.transpose(arr(key), (2, 3, 1, 0))  # OIHW -> HWIO

    def bn(prefix):
        p = {"scale": arr(f"{prefix}.weight"), "bias": arr(f"{prefix}.bias")}
        s = {"mean": arr(f"{prefix}.running_mean"), "var": arr(f"{prefix}.running_var")}
        return p, s

    params, stats = {}, {}
    params["conv1"] = {"kernel": conv("conv1.weight")}
    params["bn1"], stats["bn1"] = bn("bn1")
    for stage in range(1, 5):
        for block in range(2):
            name = f"layer{stage}_{block}"
            tname = f"layer{stage}.{block}"
            bp, bs = {}, {}
            bp["conv1"] = {"kernel": conv(f"{tname}.conv1.weight")}
            bp["conv2"] = {"kernel": conv(f"{tname}.conv2.weight")}
            bp["bn1"], bs["bn1"] = bn(f"{tname}.bn1")
            bp["bn2"], bs["bn2"] = bn(f"{tname}.bn2")
            if f"{tname}.downsample.0.weight" in state_dict:
                bp["downsample_conv"] = {"kernel": conv(f"{tname}.downsample.0.weight")}
                bp["downsample_bn"], bs["downsample_bn"] = bn(f"{tname}.downsample.1")
            params[name] = bp
            stats[name] = bs
    return {"params": params, "batch_stats": stats}
