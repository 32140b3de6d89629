"""Native host-path accelerators with transparent numpy fallbacks.

``AVAILABLE`` reports whether the C++ extension loaded. Every public function
works either way; the extension removes Python-loop overhead from the
per-frame data path (target splatting, host NMS, augmentation warp).
"""

from __future__ import annotations

import numpy as np

_ext_cache = None


def _load():
    global _ext_cache
    if _ext_cache is not None:
        return _ext_cache
    try:
        from mvdetr_tpu.native import _dataio as ext  # type: ignore

        _ext_cache = ext
        return ext
    except ImportError:
        pass
    from mvdetr_tpu.native.build import build

    if build():
        import importlib

        importlib.invalidate_caches()
        from mvdetr_tpu.native import _dataio as ext  # type: ignore

        _ext_cache = ext
        return ext
    _ext_cache = False
    return False


def available() -> bool:
    return bool(_load())


def splat_gaussian(heatmap: np.ndarray, centers: np.ndarray, sigma: float) -> np.ndarray:
    """In-place max-composite Gaussian splats. ``heatmap`` [H, W] f32,
    ``centers`` [K, 2] int (x, y)."""
    ext = _load()
    centers = np.ascontiguousarray(centers, dtype=np.int32).reshape(-1, 2)
    if ext:
        assert heatmap.dtype == np.float32 and heatmap.flags["C_CONTIGUOUS"]
        ext.splat_gaussian(heatmap, centers, float(sigma))
        return heatmap
    from mvdetr_tpu.data.targets import splat_gaussian as np_splat

    for c in centers:
        np_splat(heatmap, c, sigma)
    return heatmap


def greedy_nms(points: np.ndarray, scores: np.ndarray, thres: float) -> np.ndarray:
    """Greedy distance NMS -> bool keep mask [K] (reference `utils/nms.py:7-44`)."""
    ext = _load()
    points = np.ascontiguousarray(points, dtype=np.float32).reshape(-1, 2)
    scores = np.ascontiguousarray(scores, dtype=np.float32).reshape(-1)
    if ext:
        raw = ext.greedy_nms(points, scores, float(thres))
        return np.frombuffer(raw, dtype=np.uint8).astype(bool)
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(scores), dtype=bool)
    dead = np.zeros(len(scores), dtype=bool)
    for i in order:
        if dead[i]:
            continue
        keep[i] = True
        d2 = np.sum((points - points[i]) ** 2, axis=1)
        dead |= d2 <= thres * thres
    return keep


def warp_image_u8(img: np.ndarray, mat: np.ndarray, border: int = 128) -> np.ndarray:
    """Bilinear perspective warp of a [H, W, 3] uint8 image by the src->dst
    matrix ``mat`` (the augmentation warp, `utils/image_utils.py:43-44`)."""
    ext = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    mat = np.ascontiguousarray(mat, dtype=np.float64)
    if ext:
        raw = ext.warp_u8(img, mat, int(border))
        return np.frombuffer(raw, dtype=np.uint8).reshape(img.shape).copy()
    try:
        import cv2

        h, w = img.shape[:2]
        return cv2.warpPerspective(img, mat, dsize=(w, h), flags=cv2.INTER_LINEAR,
                                   borderValue=(border,) * 3)
    except Exception:
        from mvdetr_tpu.utils.visualize import warp_image_np

        out = warp_image_np(img.astype(np.float64), mat, img.shape[:2])
        return np.clip(out, 0, 255).astype(np.uint8)
