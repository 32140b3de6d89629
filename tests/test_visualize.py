"""Visualization + multihost helper tests."""

import numpy as np

from mvdetr_tpu.geometry import make_synthetic_rig
from mvdetr_tpu.utils.visualize import detection_video_frames, grid_overlay, shadow_points, warp_image_np


def test_warp_image_np_identity(rng):
    img = rng.uniform(0, 1, (12, 16, 3))
    out = warp_image_np(img, np.eye(3), (12, 16))
    np.testing.assert_allclose(out, img, atol=1e-9)


def test_grid_overlay_shapes(rng):
    rig = make_synthetic_rig(num_cam=2, img_shape=(48, 96), worldgrid_shape=(32, 64))
    images = [rng.uniform(0, 255, (48, 96, 3)).astype(np.uint8) for _ in range(2)]
    outs = grid_overlay(rig, images, world_reduce=2)
    assert len(outs) == 2
    for bev in outs:
        assert bev.shape == (16, 32, 3)
        assert bev.dtype == np.uint8


def test_shadow_points_structure(rng):
    rig = make_synthetic_rig(num_cam=2, img_shape=(48, 96), worldgrid_shape=(32, 64))
    q, m, l, p = 10, 2, 2, 4
    loc = rng.uniform(0, 1, (q, m, l, p, 2))
    w = rng.uniform(0, 1, (q, m, l, p))
    pts = shadow_points(rig, loc, w, None, world_reduce=2, downsample=2)
    assert set(pts) == {0, 1}
    assert pts[0][0].shape == (q * m * p, 2)


def test_detection_video_frames(rng):
    rig = make_synthetic_rig(num_cam=2, img_shape=(48, 96), worldgrid_shape=(32, 64))
    det = np.array([[0, 30.0, 16.0]])
    imgs = {0: [np.zeros((48, 96, 3), np.uint8) for _ in range(2)]}
    out = detection_video_frames(rig, det, imgs)
    assert len(out[0]) == 2
    assert any(im.max() > 0 for im in out[0])  # some box got drawn


def test_multihost_single_process():
    import jax

    from mvdetr_tpu.parallel import make_mesh
    from mvdetr_tpu.parallel.multihost import global_batch_from_local, process_batch_slice

    assert process_batch_slice(8) == slice(0, 8)
    mesh = make_mesh(num_view_shards=1, devices=jax.devices()[:2])
    batch = {
        "imgs": np.zeros((2, 4, 8, 8, 3), np.float32),
        "affine_mats": np.zeros((2, 4, 3, 3), np.float32),
        "frame": np.zeros((2,), np.int64),
        "world_gt": {"heatmap": np.zeros((2, 4, 4, 1), np.float32), "reg_mask": np.zeros((2, 3), bool),
                     "idx": np.zeros((2, 3), np.int64), "pid": np.zeros((2, 3), np.int64),
                     "offset": np.zeros((2, 3, 2), np.float32)},
        "imgs_gt": {k: np.zeros((2, 4, 3) + s, np.float32) for k, s in
                    [("heatmap", ()), ("reg_mask", ()), ("idx", ()), ("pid", ()), ("offset", (2,)), ("wh", (2,))]},
    }
    # imgs_gt heatmap needs spatial dims; rebuild properly
    batch["imgs_gt"]["heatmap"] = np.zeros((2, 4, 4, 4, 1), np.float32)
    g = global_batch_from_local(batch, mesh)
    assert g["imgs"].shape == (2, 4, 8, 8, 3)
