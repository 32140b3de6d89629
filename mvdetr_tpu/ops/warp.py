"""Perspective (homography) warping of NHWC feature maps.

TPU-native equivalent of the reference's ``kornia.warp_perspective`` call that
projects per-view CNN features onto the ground plane
(`/root/reference/multiview_detector/models/mvdetr.py:194-195`). The
view-coherent augmentation is fused here by construction: callers compose the
inverse augmentation affine into the projection matrix *before* warping
(`mvdetr.py:155-161`), so a single resampling pass moves augmented features
into the right BEV cells.

``mats`` map **source pixels -> destination pixels** (same direction as the
reference's ``proj_mats``); the inverse needed for output-driven sampling is
taken on device (3x3, negligible).

The default path is pure-jnp bilinear gather (XLA lowers it to an efficient
row gather over the C-contiguous last axis). A Pallas kernel can be swapped in
behind the same signature for the HBM-bandwidth-bound cases.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mvdetr_tpu.ops.sampling import bilinear_patch_sample, bilinear_scatter_matmul


def invert_3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det).

    Avoids ``jnp.linalg.inv``'s LU path for tiny matrices inside jit.
    ``m``: [..., 3, 3].
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def _warp_coords(mats: jnp.ndarray, out_shape):
    """Source pixel coords sampled by each destination cell: two [B, Ho*Wo] arrays."""
    ho, wo = out_shape
    inv = invert_3x3(mats.astype(jnp.float32))  # dst -> src

    ys, xs = jnp.meshgrid(
        jnp.arange(ho, dtype=jnp.float32), jnp.arange(wo, dtype=jnp.float32), indexing="ij"
    )
    dst = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1).reshape(-1, 3)  # [Ho*Wo, 3]
    src = jnp.einsum("bij,qj->bqi", inv, dst)
    eps = 1e-8
    z = src[..., 2]
    z = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    return src[..., 0] / z, src[..., 1] / z


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _patch_sample_nocoordgrad(feats, sx, sy, h: int, w: int):
    """:func:`bilinear_patch_sample` with an MXU scatter-free backward.

    The feature cotangent is computed via :func:`bilinear_scatter_matmul`
    (one-hot contraction on the MXU) instead of the XLA scatter-add autodiff
    transpose, which serializes on TPU (~100x slower at BEV-warp scale).
    Sampling coordinates are treated as non-differentiable resampling data
    (zero cotangent) — in MVDeTr they come from camera calibration and the
    augmentation affine, never from parameters (`mvdetr.py:155-161`).
    """
    return bilinear_patch_sample(feats, sx, sy)


def _patch_sample_fwd(feats, sx, sy, h, w):
    return bilinear_patch_sample(feats, sx, sy), (sx, sy)


def _patch_sample_bwd(h, w, res, g):
    sx, sy = res
    return warp_scatter_accumulate(g, sx, sy, h, w), jnp.zeros_like(sx), jnp.zeros_like(sy)


def warp_scatter_accumulate(g: jnp.ndarray, sx, sy, h: int, w: int) -> jnp.ndarray:
    """Adjoint-of-sampling dispatch: Pallas kernel on TPU
    (`ops/pallas/warp_bwd.py` — VMEM-resident accumulator, MXU contraction),
    XLA one-hot matmul (`ops/sampling.py`) elsewhere."""
    import os

    c = g.shape[-1]
    if jax.default_backend() == "tpu" and os.environ.get("MVDETR_NO_PALLAS", "0") != "1":
        ok = (
            c % 128 == 0
            and w % 16 == 0  # out-block sublane tile (bf16)
            and w * h * c * 4 <= 64 * 1024 * 1024  # f32 accumulator must fit VMEM
        )
        if ok:
            from mvdetr_tpu.ops.pallas.warp_bwd import warp_bwd_pallas

            return warp_bwd_pallas(g, sx, sy, h, w)
        from mvdetr_tpu.ops.msda_windowed import log_fallback_once

        log_fallback_once(
            f"warp_bwd_{h}x{w}x{c}",
            f"warp backward falling back to the XLA one-hot path for shape "
            f"{h}x{w}x{c} (needs C%128==0, W%16==0, H*W*C*4 <= 64MB)",
        )
    return bilinear_scatter_matmul(g, sx, sy, h, w)


_patch_sample_nocoordgrad.defvjp(_patch_sample_fwd, _patch_sample_bwd)


def perspective_warp(feats: jnp.ndarray, mats: jnp.ndarray, out_shape) -> jnp.ndarray:
    """Warp ``feats [B, H, W, C]`` by per-sample homographies ``mats [B, 3, 3]``.

    ``mats`` maps source pixel coords (x, y, 1) to destination pixel coords.
    Output is ``[B, Ho, Wo, C]`` with zeros outside the source support.
    Destination pixels are sampled at their integer-center coordinates.
    Differentiable w.r.t. ``feats`` (scatter-free TPU backward); ``mats`` get
    a zero cotangent — see :func:`_patch_sample_nocoordgrad`.
    """
    ho, wo = out_shape
    b, h, w, c = feats.shape
    sx, sy = _warp_coords(mats, out_shape)
    out = _patch_sample_nocoordgrad(feats, sx, sy, h, w)  # [B, Ho*Wo, C]
    return out.reshape(b, ho, wo, c)
