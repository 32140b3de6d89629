"""Deformable 2D convolution (DCNv1-style, no modulation mask).

TPU-native equivalent of ``torchvision.ops.DeformConv2d`` as used by the
``deform_conv`` world-feature variant
(`/root/reference/multiview_detector/models/conv_world_feat.py:55-76`):
each kernel tap samples the input at its regular position plus a predicted
per-pixel offset, bilinearly, then the taps are mixed by the conv weights.

Expressed as K=kh*kw bilinear gathers + K (Cin, Cout) matmuls — gathers ride
XLA's gather, the channel mixing rides the MXU.

Offset layout: ``offsets[..., k, :] = (dx, dy)`` for kernel tap ``k`` in
row-major (kh, kw) order.
"""

from __future__ import annotations

import jax.numpy as jnp

from mvdetr_tpu.ops.sampling import bilinear_sample_batched


def deform_conv2d(
    x: jnp.ndarray,  # [B, H, W, Cin]
    offsets: jnp.ndarray,  # [B, H, W, K, 2] (dx, dy)
    weight: jnp.ndarray,  # [kh, kw, Cin, Cout]
    bias: jnp.ndarray | None = None,  # [Cout]
) -> jnp.ndarray:
    b, h, w, cin = x.shape
    kh, kw, cin2, cout = weight.shape
    assert cin == cin2 and offsets.shape[3] == kh * kw

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=x.dtype), jnp.arange(w, dtype=x.dtype), indexing="ij")
    pad_y, pad_x = (kh - 1) // 2, (kw - 1) // 2

    out = jnp.zeros((b, h, w, cout), dtype=x.dtype)
    for k in range(kh * kw):
        ki, kj = k // kw, k % kw
        sx = xs[None] + (kj - pad_x) + offsets[..., k, 0]
        sy = ys[None] + (ki - pad_y) + offsets[..., k, 1]
        tap = bilinear_sample_batched(x, sx, sy)  # [B, H, W, Cin]
        out = out + tap @ weight[ki, kj]
    if bias is not None:
        out = out + bias
    return out
