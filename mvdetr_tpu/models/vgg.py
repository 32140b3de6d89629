"""VGG-11 feature trunk (secondary backbone option).

Mirrors the reference's surgery on ``torchvision.vgg11().features``
(`/root/reference/multiview_detector/models/mvdetr.py:97-101`): the final
maxpool and the ReLU after the 5th-stage first conv are replaced by
identities, leaving output stride 16 and 512 channels.
"""

from __future__ import annotations

import flax.linen as nn

# (channels, relu_after) per conv, 'M' = maxpool; the trailing pool is dropped
# and conv #7 (index 16 in torchvision) loses its ReLU per the reference edit.
_LAYOUT = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", (512, False), 512)


class VGG11Features(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = True):
        i = 0
        for spec in _LAYOUT:
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            ch, relu_after = spec if isinstance(spec, tuple) else (spec, True)
            x = nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2, name=f"conv{i}")(x)
            if relu_after:
                x = nn.relu(x)
            i += 1
        return x


# torchvision vgg11.features conv indices, in order (`mvdetr.py:97-101` keeps
# all eight convs; only layer 17's ReLU and layer 20's pool are removed).
_TORCHVISION_CONV_IDX = (0, 3, 6, 8, 11, 13, 16, 18)


def load_torchvision_vgg11_state_dict(state_dict) -> dict:
    """Convert torchvision ``vgg11`` weights (``features.N.weight/bias``,
    OIHW) to this module's params. Returns ``{"params": ...}`` (no BN)."""
    import numpy as np

    def arr(key):
        v = state_dict[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params = {}
    for i, t in enumerate(_TORCHVISION_CONV_IDX):
        params[f"conv{i}"] = {
            "kernel": np.transpose(arr(f"features.{t}.weight"), (2, 3, 1, 0)),
            "bias": arr(f"features.{t}.bias"),
        }
    return {"params": params}
