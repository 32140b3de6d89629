"""Real-dataset adapter tests against synthetic on-disk fixtures: a minimal
Wildtrack-format tree (OpenCV FileStorage XMLs, rvec/tvec extrinsics, JSON
annotations, POM rectangles) written from a known synthetic rig, then loaded
back — verifying the full calibration/annotation ingestion path
(`datasets/Wildtrack.py:79-118`, `frameDataset.py:90-127` contracts)."""

import json
import os

import numpy as np
import pytest

from mvdetr_tpu.data.adapters import MultiviewXScene, WildtrackScene, _read_opencv_matrix, _read_vector_node
from mvdetr_tpu.geometry import make_synthetic_rig, project_points
from tests._fixture_trees import (
    multiviewx_like_scene,
    opencv_matrix_xml as _opencv_matrix_xml,
    rotation_to_rvec as _rotation_to_rvec,
    rvec_tvec_xml_raw as _rvec_tvec_xml,
    write_multiviewx_tree,
)


@pytest.fixture(scope="module")
def fake_wildtrack(tmp_path_factory):
    root = tmp_path_factory.mktemp("Wildtrack")
    rig = make_synthetic_rig(
        num_cam=7, img_shape=(1080, 1920), worldgrid_shape=(480, 1440), cell_meters=0.025,
        indexing="ij", worldcoord_unit=0.01, origin_offset=(-300.0, -900.0),
        camera_height_m=6.0, camera_margin_m=4.0,
    )
    os.makedirs(root / "calibrations" / "intrinsic_zero")
    os.makedirs(root / "calibrations" / "extrinsic")
    from mvdetr_tpu.data.adapters import _WILDTRACK_EXTR, _WILDTRACK_INTR

    for cam in range(7):
        (root / "calibrations" / "intrinsic_zero" / _WILDTRACK_INTR[cam]).write_text(
            _opencv_matrix_xml("camera_matrix", rig.intrinsic_matrices[cam])
        )
        R = rig.extrinsic_matrices[cam][:, :3]
        t = rig.extrinsic_matrices[cam][:, 3]
        (root / "calibrations" / "extrinsic" / _WILDTRACK_EXTR[cam]).write_text(
            _rvec_tvec_xml(_rotation_to_rvec(R), t)
        )

    os.makedirs(root / "annotations_positions")
    ann = [
        {
            "personID": 5,
            "positionID": int(100 + 480 * 200),  # grid (100, 200) under ij
            "views": [
                {"viewNum": c, "xmin": 10 * c, "ymin": 20, "xmax": 10 * c + 40, "ymax": 120}
                if c < 3
                else {"viewNum": c, "xmin": -1, "ymin": -1, "xmax": -1, "ymax": -1}
                for c in range(7)
            ],
        }
    ]
    (root / "annotations_positions" / "00000000.json").write_text(json.dumps(ann))
    return str(root), rig


def test_opencv_xml_parsers(fake_wildtrack):
    root, rig = fake_wildtrack
    from mvdetr_tpu.data.adapters import _WILDTRACK_EXTR, _WILDTRACK_INTR

    mat = _read_opencv_matrix(os.path.join(root, "calibrations", "intrinsic_zero", _WILDTRACK_INTR[0]),
                              "camera_matrix")
    np.testing.assert_allclose(mat, rig.intrinsic_matrices[0], rtol=1e-12)
    rvec = _read_vector_node(os.path.join(root, "calibrations", "extrinsic", _WILDTRACK_EXTR[0]), "rvec")
    assert rvec.shape == (3,)


def test_wildtrack_scene_roundtrip(fake_wildtrack):
    root, rig = fake_wildtrack
    scene = WildtrackScene(root)
    assert scene.rig.num_cam == 7
    assert scene.rig.indexing == "ij"
    # calibration roundtrip: projections through loaded vs original matrices agree
    pts = np.array([[0.0, 0.0], [100.0, -50.0]])
    for cam in range(7):
        a = project_points(scene.rig.imgcoord_from_worldcoord_mat(cam), pts)
        b = project_points(rig.imgcoord_from_worldcoord_mat(cam), pts)
        np.testing.assert_allclose(a, b, atol=1e-5)

    assert scene.frames() == [0]
    ann = scene.annotation(0)
    np.testing.assert_array_equal(ann.world_pts, [[100, 200]])
    assert ann.pids.tolist() == [5]
    for c in range(3):
        np.testing.assert_allclose(ann.bboxes[c], [[10 * c, 20, 10 * c + 40, 120]])
    for c in range(3, 7):
        assert len(ann.bboxes[c]) == 0


def test_multiviewx_scene_roundtrip(tmp_path):
    """MultiviewX-format tree (FileStorage rvec/tvec mats, `MultiviewX.py:79-98`)
    written from a synthetic scene and loaded back through the adapter."""
    scene = multiviewx_like_scene(num_frame=3, num_person=5, img_shape=(270, 480))
    root = tmp_path / "MultiviewX"
    write_multiviewx_tree(str(root), scene, with_images=False)

    loaded = MultiviewXScene(str(root))
    assert loaded.rig.num_cam == 6
    assert loaded.rig.indexing == "xy"
    assert loaded.rig.worldcoord_unit == 1.0
    pts = np.array([[0.0, 0.0], [5.0, -3.0]])
    for cam in range(6):
        a = project_points(loaded.rig.imgcoord_from_worldcoord_mat(cam), pts)
        b = project_points(scene.rig.imgcoord_from_worldcoord_mat(cam), pts)
        np.testing.assert_allclose(a, b, atol=1e-5)

    assert loaded.frames() == [0, 1, 2]
    ann = loaded.annotation(0)
    want = scene.annotation(0)
    np.testing.assert_array_equal(ann.world_pts, np.round(want.world_pts))
    np.testing.assert_array_equal(ann.pids, want.pids)
    for cam in range(6):
        assert len(ann.bboxes[cam]) == len(want.bboxes[cam])
