"""Detection decoding — fixed-shape, jit-friendly.

Re-derivations of the reference decoders
(`/root/reference/multiview_detector/utils/decode.py:47-93`) in NHWC layout:

- ``mvdet_decode``: dense decode — every BEV cell emits (x, y, score) with its
  regressed sub-cell offset, scaled back to full-grid units (this is what the
  test loop consumes, `trainer.py:121-124`).
- ``ctdet_decode``: CenterNet-style sparse decode — 3x3 peak suppression, then
  top-K with gathered offsets/sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def heatmap_peaks(scoremap: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """Keep only local maxima of ``scoremap [B, H, W, C]`` (`decode.py:7-11`)."""
    pad = (kernel_size - 1) // 2
    hmax = jax.lax.reduce_window(
        scoremap,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return jnp.where(hmax == scoremap, scoremap, 0.0)


def mvdet_decode(scoremap: jnp.ndarray, offset: jnp.ndarray | None = None, reduce: int = 4) -> jnp.ndarray:
    """Dense decode (`decode.py:80-93`).

    ``scoremap``: [B, H, W, 1] (already sigmoided), ``offset``: [B, H, W, 2].
    Returns [B, H*W, 3] rows of (x, y, score) in full-resolution grid units.
    """
    b, h, w, _ = scoremap.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    xy = jnp.broadcast_to(jnp.stack([xs, ys], axis=-1).reshape(1, h * w, 2), (b, h * w, 2))
    if offset is not None:
        xy = xy + offset.reshape(b, h * w, 2)
    else:
        xy = xy + 0.5
    xy = xy * reduce
    scores = scoremap.reshape(b, h * w, 1)
    return jnp.concatenate([xy, scores], axis=-1)


def ctdet_decode(
    heatmap: jnp.ndarray,
    offset: jnp.ndarray | None = None,
    wh: jnp.ndarray | None = None,
    top_k: int = 100,
) -> jnp.ndarray:
    """Sparse top-K decode (`decode.py:47-77`).

    ``heatmap``: [B, H, W, 1] logits. Returns [B, K, 3] (x, y, score) or
    [B, K, 5] (x, y, w, h, score) when ``wh`` is given; coordinates in
    feature-grid units.
    """
    b, h, w, _ = heatmap.shape
    score = heatmap_peaks(jax.nn.sigmoid(heatmap))
    flat = score.reshape(b, h * w)
    top_scores, top_idx = jax.lax.top_k(flat, top_k)
    xs = (top_idx % w).astype(jnp.float32)
    ys = (top_idx // w).astype(jnp.float32)
    xy = jnp.stack([xs, ys], axis=-1)
    if offset is not None:
        off = jnp.take_along_axis(offset.reshape(b, h * w, 2), top_idx[..., None], axis=1)
        xy = xy + off
    else:
        xy = xy + 0.5
    cols = [xy]
    if wh is not None:
        cols.append(jnp.take_along_axis(wh.reshape(b, h * w, 2), top_idx[..., None], axis=1))
    cols.append(top_scores[..., None])
    return jnp.concatenate(cols, axis=-1)
