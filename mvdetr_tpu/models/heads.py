"""Prediction heads.

Contract from `/root/reference/multiview_detector/models/mvdetr.py:24-30`
(``output_head``): optional 3x3+ReLU neck then a 1x1 projection. Heatmap heads
initialize their final bias to -2.19 (`mvdetr.py:144-147`) so the initial
sigmoid output is ~0.1 (the CenterNet prior); offset/size heads start at zero
bias (`mvdetr.py:17-21`).
"""

from __future__ import annotations

import flax.linen as nn

HEATMAP_BIAS_INIT = -2.19


class OutputHead(nn.Module):
    out_dim: int
    feat_dim: int = 0
    final_bias: float = 0.0
    dtype: object = None  # compute dtype; logits are returned in float32

    @nn.compact
    def __call__(self, x):
        if self.feat_dim:
            x = nn.relu(nn.Conv(self.feat_dim, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                                name="neck")(x))
        out = nn.Conv(
            self.out_dim, (1, 1), bias_init=nn.initializers.constant(self.final_bias),
            dtype=self.dtype, name="proj"
        )(x)
        import jax.numpy as jnp

        return out.astype(jnp.float32)
