"""Visualization + multihost helper tests."""

import os

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


def test_capture_attention_and_shadow_backprojection():
    """Shadow-figure parity (`deform_visualize.py:44-139`): the model exposes
    sampling locations + attention weights per encoder layer, and one query's
    taps back-project into every camera."""
    import jax.numpy as jnp

    from mvdetr_tpu.data import FrameDataset, SyntheticScene
    from mvdetr_tpu.geometry import make_synthetic_rig
    from mvdetr_tpu.models import MVDeTr
    from mvdetr_tpu.train import create_train_state
    from mvdetr_tpu.utils.visualize import capture_attention, shadow_backprojected

    rig = make_synthetic_rig(num_cam=3, img_shape=(96, 160), worldgrid_shape=(48, 96))
    scene = SyntheticScene(rig, num_frame=3, num_person=3, seed=0)
    ds = FrameDataset(scene, train=True, world_reduce=2, img_reduce=12, top_k=8)
    batch = next(ds.batches(batch_size=1))
    model = MVDeTr.from_rig(rig, world_reduce=2, img_reduce=12,
                            world_feat_arch="deform_trans", n_points=8, bottleneck_dim=32)
    state = create_train_state(model, batch, total_steps=4)

    _, layers = capture_attention(state, batch)
    assert len(layers) == 3  # one per encoder layer
    n = rig.num_cam
    hs, ws = (v // 2 for v in ds.Rworld_shape)
    q = n * hs * ws
    for layer in layers:
        assert layer["sampling_locations"].shape == (1, q, 8, n, 8, 2)
        assert layer["attention_weights"].shape == (1, q, 8, n, 8)
        np.testing.assert_allclose(layer["attention_weights"].sum((-1, -2)), 1.0, atol=1e-4)

    bev, cams = shadow_backprojected(rig, layers[0]["sampling_locations"][0],
                                     layers[0]["attention_weights"][0],
                                     query_index=q // 2, world_reduce=2, downsample=2)
    assert set(cams) == set(range(n))
    for cam in cams:
        pts, wts = cams[cam]
        assert pts.shape == (8 * 8, 2) and wts.shape == (8 * 8,)
        assert np.isfinite(pts).all()


def test_forward_stage_capture_and_figures(tmp_path):
    """Per-stage feature dumps (`mvdetr.py:163-175,196-201,209-217` visualize
    parity): all three stages captured with the right shapes and figure files
    written."""
    from mvdetr_tpu.data import FrameDataset, SyntheticScene
    from mvdetr_tpu.geometry import make_synthetic_rig
    from mvdetr_tpu.models import MVDeTr
    from mvdetr_tpu.train import create_train_state
    from mvdetr_tpu.utils.visualize import capture_forward_stages, save_forward_stage_figures

    rig = make_synthetic_rig(num_cam=3, img_shape=(96, 160), worldgrid_shape=(48, 96))
    scene = SyntheticScene(rig, num_frame=3, num_person=3, seed=0)
    ds = FrameDataset(scene, train=True, world_reduce=2, img_reduce=12, top_k=8)
    batch = next(ds.batches(batch_size=1))
    model = MVDeTr.from_rig(rig, world_reduce=2, img_reduce=12,
                            world_feat_arch="deform_trans", bottleneck_dim=32)
    state = create_train_state(model, batch, total_steps=4)

    _, stages = capture_forward_stages(state, batch)
    hs, ws = ds.Rworld_shape
    assert stages["img_featmap"].shape[0] == 3  # B*N per-view maps
    assert stages["world_inputs"].shape == (1, 3, hs, ws, 32)
    assert stages["world_feature"].shape == (1, hs, ws, 32)

    paths = save_forward_stage_figures(state, batch, str(tmp_path))
    assert len(paths) == 3 and all(os.path.exists(p) for p in paths)
