"""Data-pipeline tests: targets, augmentation, synthetic scene geometry,
dataset batch shapes (mirrors `datasets/frameDataset.py:242-301` self-tests)."""

import numpy as np
import pytest

from mvdetr_tpu.data import FrameDataset, SyntheticScene, build_targets, collate, random_affine
from mvdetr_tpu.geometry import make_synthetic_rig, project_points


@pytest.fixture(scope="module")
def scene():
    rig = make_synthetic_rig(num_cam=3, img_shape=(96, 160), worldgrid_shape=(48, 96))
    return SyntheticScene(rig, num_frame=10, num_person=5, seed=7)


def test_build_targets_contract():
    gt = build_targets((10, 16), [12.4, 63.9], [8.1, 30.0], [8.0, 4.0], [20.0, 10.0], [3, 4],
                       reduce=4, top_k=8, kernel_size=4)
    assert gt["heatmap"].shape == (10, 16, 1)
    assert gt["reg_mask"].tolist() == [True, True] + [False] * 6
    # first: ct = (3.1, 2.025) -> cell (3, 2), idx = 2*16+3
    assert gt["idx"][0] == 2 * 16 + 3
    np.testing.assert_allclose(gt["offset"][0], [0.1, 0.025], atol=1e-5)
    np.testing.assert_allclose(gt["wh"][0], [2.0, 5.0], atol=1e-6)
    assert gt["heatmap"][2, 3, 0] == 1.0  # peak exactly 1 at the center cell
    # second point: x=63.9/4=15.975 -> cell 15 (in range), peak at (7, 15)
    assert gt["heatmap"][7, 15, 0] == 1.0


def test_build_targets_out_of_range():
    gt = build_targets((10, 16), [100.0], [5.0], pids=[1], reduce=4, top_k=4)
    assert not gt["reg_mask"].any()
    assert gt["heatmap"].max() == 0


def test_random_affine_box_consistency(rng):
    img = (rng.uniform(0, 255, (60, 80, 3))).astype(np.uint8)
    boxes = np.array([[10.0, 10.0, 30.0, 50.0], [40.0, 5.0, 70.0, 55.0]])
    pids = np.array([1, 2])
    warped, new_boxes, new_pids, M = random_affine(img, boxes, pids, np.random.default_rng(3))
    assert warped.shape == img.shape
    assert M.shape == (3, 3)
    assert len(new_boxes) == len(new_pids)
    # surviving box centers, mapped back through inv(M), should lie near the original boxes
    if len(new_boxes):
        inv = np.linalg.inv(M)
        for bb, pid in zip(new_boxes, new_pids):
            c = np.array([[(bb[0] + bb[2]) / 2, (bb[1] + bb[3]) / 2]])
            back = project_points(inv, c)[0]
            ob = boxes[pid - 1]
            assert ob[0] - 12 <= back[0] <= ob[2] + 12
            assert ob[1] - 12 <= back[1] <= ob[3] + 12


def test_synthetic_scene_bbox_feet_project_to_world(scene):
    """Foot points of rendered bboxes must reproject onto the annotated grid cell."""
    rig = scene.rig
    ann = scene.annotation(0)
    checked = 0
    for cam in range(rig.num_cam):
        for bb, pid in zip(ann.bboxes[cam], ann.bbox_pids[cam]):
            j = list(ann.pids).index(pid)
            grid_xy = ann.world_pts[j]
            foot_img = np.array([[(bb[0] + bb[2]) / 2, bb[3]]])
            wc = project_points(rig.worldcoord_from_imgcoord_mat(cam, 0.0), foot_img)
            grid_back = rig.worldgrid_from_worldcoord(wc)[0]
            err_m = np.linalg.norm(grid_back - grid_xy) * 0.025  # cells -> meters
            if (bb[3] < rig.img_shape[0] - 1 and bb[0] > 0 and bb[2] < rig.img_shape[1] - 1):
                assert err_m < 0.3, f"cam {cam} pid {pid}: foot reprojection error {err_m:.2f} m"
                checked += 1
    assert checked > 0


def test_frame_dataset_shapes(scene):
    ds = FrameDataset(scene, train=True, world_reduce=2, img_reduce=12, top_k=16, augmentation=True)
    n = scene.rig.num_cam
    item = ds[0]
    hi, wi = ds.input_shape
    assert item["imgs"].shape == (n, hi, wi, 3)
    assert item["affine_mats"].shape == (n, 3, 3)
    assert item["world_gt"]["heatmap"].shape == (*ds.Rworld_shape, 1)
    assert item["imgs_gt"]["heatmap"].shape == (n, *ds.Rimg_shape, 1)
    assert item["imgs_gt"]["wh"].shape == (n, 16, 2)
    batch = collate([ds[0], ds[1]])
    assert batch["imgs"].shape == (2, n, hi, wi, 3)
    assert batch["world_gt"]["idx"].shape == (2, 16)


def test_frame_dataset_split(scene):
    tr = FrameDataset(scene, train=True)
    te = FrameDataset(scene, train=False)
    assert len(tr) == 9 and len(te) == 1
    assert set(tr.frames).isdisjoint(te.frames)


def test_gt_array(scene):
    ds = FrameDataset(scene, train=True)
    gt = ds.gt_array()
    assert gt.shape[1] == 3
    assert set(np.unique(gt[:, 0])).issubset(set(ds.frames))


def test_world_targets_ij_swap():
    """On an ij rig (Wildtrack), world GT must be swapped to model-xy before
    splatting (`frameDataset.py:108-111`): reg_mask full, cell = (gy/r, gx/r)."""
    from mvdetr_tpu.geometry import make_wildtrack_like_rig

    rig = make_wildtrack_like_rig(num_cam=4, img_shape=(96, 160), worldgrid_shape=(48, 96))
    scene_ij = SyntheticScene(rig, num_frame=6, num_person=5, seed=1)
    ds = FrameDataset(scene_ij, train=True, world_reduce=2, top_k=8)
    item = ds[0]
    ann = scene_ij.annotation(ds.frames[0])
    n = len(ann.pids)
    assert n > 0
    mask = item["world_gt"]["reg_mask"]
    assert mask[:n].all(), f"ij world GT dropped: {mask[:n]}"
    assert not mask[n:].any()
    wid = ds.Rworld_shape[1]
    for k in range(n):
        gx, gy = ann.world_pts[k]  # native: x spans the rows on ij rigs
        cell_x, cell_y = int(gy / 2), int(gx / 2)
        assert item["world_gt"]["idx"][k] == cell_y * wid + cell_x


def test_camera_dropout(scene):
    ds = FrameDataset(scene, train=True, dropout=1.0, top_k=8)
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    zeroed = [cam for cam in range(scene.rig.num_cam) if item["imgs_gt"]["heatmap"][cam].max() == 0]
    assert len(zeroed) >= 1  # exactly one camera's GT wiped (unless it had no people)


def test_batches_iterator(scene):
    ds = FrameDataset(scene, train=True, top_k=8)
    batches = list(ds.batches(batch_size=2, num_workers=2))
    assert len(batches) == 4  # 9 frames, drop_last
    for b in batches:
        assert b["imgs"].shape[0] == 2
