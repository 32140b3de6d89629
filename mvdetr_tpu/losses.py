"""Training losses.

Contracts from `/root/reference/multiview_detector/loss/losses.py` and
`utils/tensor_utils.py`, in NHWC layout with fixed-size (top-K padded) target
arrays:

- ``focal_loss``: CornerNet-modified focal loss — positives are cells where
  the target equals exactly 1, negatives are weighted by (1-t)^4, total
  normalized by the positive count (`losses.py:17-51`).
- ``reg_l1_loss``: masked L1 on values gathered at GT cell indices, summed and
  divided by the mask count (`losses.py:54-64`).
- ``gaussian_mse_loss``: the MVDet-legacy plain MSE alternative selected by
  ``--use_mse`` (`trainer.py:64-66`).

Predictions enter as raw logits; the clamped sigmoid bounds them to
[1e-4, 1 - 1e-4] (`tensor_utils.py:4-6`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clamped_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jax.nn.sigmoid(x), 1e-4, 1.0 - 1e-4)


def focal_loss(logits: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """CornerNet focal loss over heatmaps.

    ``logits``/``target``: [B, H, W, C]; ``mask`` optionally gates the
    negative term. Returns a scalar.
    """
    p = clamped_sigmoid(logits)
    pos = (target == 1.0).astype(p.dtype)
    neg = (target < 1.0).astype(p.dtype)
    neg_weights = jnp.power(1.0 - target, 4)

    pos_loss = jnp.log(p) * jnp.power(1.0 - p, 2) * pos
    neg_loss = jnp.log(1.0 - p) * jnp.power(p, 2) * neg_weights * neg
    if mask is not None:
        neg_loss = neg_loss * mask

    num_pos = jnp.sum(pos)
    pos_sum = jnp.sum(pos_loss)
    neg_sum = jnp.sum(neg_loss)
    return jnp.where(num_pos == 0, -neg_sum, -(pos_sum + neg_sum) / jnp.maximum(num_pos, 1.0))


def gather_at_indices(output: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather feature vectors at flattened spatial indices.

    ``output``: [B, H, W, C]; ``idx``: [B, K] int indices into H*W
    (row-major), as produced by the target builder. Returns [B, K, C].
    Equivalent of `tensor_utils.py:9-24` without the NCHW transpose.
    """
    b, h, w, c = output.shape
    flat = output.reshape(b, h * w, c)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


def reg_l1_loss(output: jnp.ndarray, mask: jnp.ndarray, idx: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Masked L1 regression at GT cells.

    ``output``: [B, H, W, C]; ``mask``: [B, K] (bool/float); ``idx``: [B, K];
    ``target``: [B, K, C]. Returns a scalar.
    """
    pred = gather_at_indices(output, idx)
    m = mask.astype(pred.dtype)[..., None] * jnp.ones_like(pred)
    loss = jnp.sum(jnp.abs(pred * m - target * m))
    return loss / (jnp.sum(m) + 1e-4)


def gaussian_mse_loss(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Plain MSE between the raw heatmap output and the Gaussian target.

    The reference's ``--use_mse`` branch feeds the head output to ``nn.MSELoss``
    without a sigmoid (`trainer.py:64-66`); sigmoid is still applied at decode
    time (`trainer.py:121`).
    """
    return jnp.mean((output - target) ** 2)


def reg_ce_loss(output: jnp.ndarray, mask: jnp.ndarray, idx: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Masked cross-entropy at GT cells — the reID head loss (`losses.py:67-79`).

    ``output``: [B, H, W, C] class logits; ``target``: [B, K] int class ids.
    Vestigial in the reference's default config (``id_ratio=0``) but part of
    the API surface.
    """
    pred = gather_at_indices(output, idx)  # [B, K, C]
    logp = jax.nn.log_softmax(pred, axis=-1)
    picked = jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    m = mask.astype(pred.dtype)
    return -jnp.sum(picked * m) / (jnp.sum(m) + 1e-4)


def gaussian_smoothed_mse_loss(output: jnp.ndarray, target: jnp.ndarray, kernel_size: int = 10) -> jnp.ndarray:
    """MVDet-legacy GaussianMSE (`loss/gaussian_mse.py:12-20`): max-pool the
    target down to the prediction's resolution, blur it with a Gaussian
    kernel, then MSE against the raw output. Exported by the reference
    (`loss/__init__.py:1`) though its trainer uses plain MSE."""
    b, ho, wo, c = output.shape
    _, ht, wt, _ = target.shape
    if (ht, wt) != (ho, wo):
        fy, fx = ht // ho, wt // wo
        target = jax.lax.reduce_window(
            target, -jnp.inf, jax.lax.max,
            window_dimensions=(1, fy, fx, 1), window_strides=(1, fy, fx, 1), padding="VALID",
        )
    sigma = kernel_size / 4.0
    radius = int(2 * sigma)
    ax = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g1 = jnp.exp(-(ax**2) / (2 * sigma**2))
    g2 = jnp.outer(g1, g1)
    g2 = (g2 / g2.max())[:, :, None, None]  # HWIO, peak-normalized
    blurred = jax.lax.conv_general_dilated(
        target, g2.astype(target.dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.mean((output - blurred) ** 2)
