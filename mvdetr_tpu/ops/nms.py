"""Ground-plane distance NMS — fixed-shape, jit-compatible.

Behavioral contract from `/root/reference/multiview_detector/utils/nms.py:7-44`
(greedy: walk candidates by descending score, drop later candidates within
``dist_thres`` of a kept one — ties at exactly ``dist_thres`` are dropped,
matching the reference's ``dists > dist_thres`` keep test),
re-expressed without data-dependent shapes: a sequential ``fori_loop`` over a
static candidate budget updating a suppression mask, instead of the
reference's shrinking-index while-loop (`nms.py:30-43`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def distance_nms(
    points: jnp.ndarray,
    scores: jnp.ndarray,
    dist_thres: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Greedy Euclidean NMS.

    ``points``: [K, 2]; ``scores``: [K]; ``valid``: optional [K] bool mask of
    real candidates. Returns a bool keep-mask [K] aligned with the input
    order. Invalid candidates are never kept and never suppress anyone.
    """
    k = scores.shape[0]
    if valid is None:
        valid = jnp.ones((k,), dtype=bool)
    order = jnp.argsort(jnp.where(valid, scores, -jnp.inf))[::-1]  # descending
    pts = points[order]
    val = valid[order]

    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    thr2 = jnp.asarray(dist_thres, dtype=d2.dtype) ** 2

    def body(i, suppressed):
        keep_i = val[i] & ~suppressed[i]
        # drop strictly-later candidates strictly within the radius
        later = jnp.arange(k) > i
        hit = keep_i & later & (d2[i] <= thr2)
        return suppressed | hit

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), dtype=bool))
    keep_sorted = val & ~suppressed
    # scatter back to input order
    keep = jnp.zeros((k,), dtype=bool).at[order].set(keep_sorted)
    return keep
