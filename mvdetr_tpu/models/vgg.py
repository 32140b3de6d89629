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
