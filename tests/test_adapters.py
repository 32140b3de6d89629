"""Real-dataset adapter tests against synthetic on-disk fixtures: a minimal
Wildtrack-format tree (OpenCV FileStorage XMLs, rvec/tvec extrinsics, JSON
annotations, POM rectangles) written from a known synthetic rig, then loaded
back — verifying the full calibration/annotation ingestion path
(`datasets/Wildtrack.py:79-118`, `frameDataset.py:90-127` contracts)."""

import json
import os

import numpy as np
import pytest

from mvdetr_tpu.data.adapters import WildtrackScene, _read_opencv_matrix, _read_vector_node
from mvdetr_tpu.geometry import make_synthetic_rig, project_points


def _opencv_matrix_xml(name, mat):
    rows, cols = mat.shape
    data = " ".join(f"{v:.17g}" for v in mat.reshape(-1))
    return (
        f'<?xml version="1.0"?>\n<opencv_storage>\n<{name} type_id="opencv-matrix">\n'
        f"  <rows>{rows}</rows>\n  <cols>{cols}</cols>\n  <dt>d</dt>\n"
        f"  <data>\n    {data}</data></{name}>\n</opencv_storage>\n"
    )


def _rvec_tvec_xml(rvec, tvec):
    rtxt = " ".join(f"{v:.17g}" for v in rvec)
    ttxt = " ".join(f"{v:.17g}" for v in tvec)
    return (
        '<?xml version="1.0"?>\n<opencv_storage>\n'
        f"<rvec>{rtxt}</rvec>\n<tvec>{ttxt}</tvec>\n</opencv_storage>\n"
    )


def _rotation_to_rvec(R):
    """Inverse Rodrigues (angle-axis from rotation matrix)."""
    angle = np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))
    if angle < 1e-9:
        return np.zeros(3)
    axis = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]) / (2 * np.sin(angle))
    return axis * angle


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
