"""Native extension tests: build, and equivalence with the numpy/cv2 paths."""

import numpy as np
import pytest

from mvdetr_tpu import native
from mvdetr_tpu.data.targets import splat_gaussian as np_splat


def test_native_builds():
    assert native.available(), "C++ dataio extension failed to build"


def test_splat_matches_numpy(rng):
    hm_native = np.zeros((40, 60), dtype=np.float32)
    hm_np = np.zeros((40, 60), dtype=np.float32)
    centers = np.array([[10, 5], [30, 20], [59, 39], [0, 0], [200, 200]], dtype=np.int32)
    native.splat_gaussian(hm_native, centers, 2.5)
    for c in centers:
        np_splat(hm_np, c, 2.5)
    np.testing.assert_allclose(hm_native, hm_np, atol=1e-6)


def test_nms_matches_reference_semantics(rng):
    from mvdetr_tpu.ops import distance_nms
    import jax.numpy as jnp

    for seed in range(3):
        r = np.random.default_rng(seed)
        pts = r.uniform(0, 40, (64, 2)).astype(np.float32)
        scores = r.uniform(0, 1, 64).astype(np.float32)
        keep_native = native.greedy_nms(pts, scores, 6.0)
        keep_device = np.asarray(distance_nms(jnp.asarray(pts), jnp.asarray(scores), 6.0))
        np.testing.assert_array_equal(keep_native, keep_device)


def test_warp_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = (rng.uniform(0, 255, (48, 64, 3))).astype(np.uint8)
    mat = np.array([[0.9, 0.05, 3.0], [-0.02, 1.1, -2.0], [1e-4, -1e-4, 1.0]])
    ours = native.warp_image_u8(img, mat, border=128)
    theirs = cv2.warpPerspective(img, mat, dsize=(64, 48), flags=cv2.INTER_LINEAR,
                                 borderValue=(128, 128, 128))
    # interiors agree within rounding; borders may differ by a pixel of support
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    assert np.quantile(diff, 0.99) <= 2, f"q99 diff {np.quantile(diff, 0.99)}"
