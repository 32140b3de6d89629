"""CLEAR metric tests, including mutual-oracle parity against the reference's
python evaluation (imported read-only from /root/reference — numpy/scipy only),
mirroring the reference's own python-vs-MATLAB mutual-oracle pattern
(`evaluation/evaluate.py:21-33`)."""

import os
import sys

import numpy as np
import pytest

from mvdetr_tpu.evaluation import clear_metrics


def test_perfect_detections():
    gt = np.array([[0, 10, 10], [0, 50, 50], [1, 30, 30]], dtype=float)
    recall, precision, moda, modp = clear_metrics(gt, gt.copy())
    assert recall == 100 and precision == 100 and moda == 100 and modp == 100


def test_near_misses_and_fp():
    gt = np.array([[0, 10, 10], [0, 100, 100]], dtype=float)
    det = np.array([[0, 14, 13], [0, 500, 500]], dtype=float)  # one match at dist 5, one fp
    recall, precision, moda, modp = clear_metrics(gt, det)
    assert recall == 50.0
    assert precision == 50.0
    assert moda == 0.0  # (1 - (1 miss + 1 fp)/2 gt) = 0
    np.testing.assert_allclose(modp, (1 - 5 / 20) * 100, atol=1e-6)


def test_no_detections():
    gt = np.array([[0, 10, 10]], dtype=float)
    assert clear_metrics(gt, np.zeros((0, 3))) == (0.0, 0.0, 0.0, 0.0)


def test_moda_clamped_at_zero():
    gt = np.array([[0, 10, 10]], dtype=float)
    det = np.array([[0, 500, 500], [0, 600, 600], [0, 700, 700]], dtype=float)
    _, _, moda, _ = clear_metrics(gt, det)
    assert moda == 0.0


def test_frames_without_detections_skipped():
    """Reference quirk: gt of frames absent from det is not counted."""
    gt = np.array([[0, 10, 10], [1, 20, 20]], dtype=float)
    det = np.array([[0, 10, 10]], dtype=float)
    recall, precision, moda, modp = clear_metrics(gt, det)
    assert recall == 100 and moda == 100  # frame 1's miss is invisible


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_parity_with_reference_pyeval(tmp_path, seed):
    ref_path = "/root/reference"
    sys.path.insert(0, ref_path)
    try:
        from multiview_detector.evaluation.pyeval.evaluateDetection import evaluateDetection_py
    except Exception:
        pytest.skip("reference pyeval not importable")
    finally:
        sys.path.remove(ref_path)

    r = np.random.default_rng(seed)
    n_frames = 6
    gt_rows, det_rows = [], []
    for t in range(n_frames):
        n = r.integers(1, 8)
        pts = r.uniform(0, 200, (n, 2))
        for p in pts:
            gt_rows.append([t, p[0], p[1]])
        # jittered detections + occasional fp / dropped gt
        for p in pts:
            if r.random() < 0.85:
                q = p + r.normal(0, 8, 2)
                det_rows.append([t, q[0], q[1]])
        for _ in range(r.integers(0, 3)):
            q = r.uniform(0, 200, 2)
            det_rows.append([t, q[0], q[1]])
    gt_rows = np.round(np.asarray(gt_rows))
    det_rows = np.round(np.asarray(det_rows))

    gt_f, det_f = tmp_path / "gt.txt", tmp_path / "det.txt"
    np.savetxt(gt_f, gt_rows, "%d")
    np.savetxt(det_f, det_rows, "%d")
    ref_recall, ref_precision, ref_moda, ref_modp = evaluateDetection_py(str(det_f), str(gt_f), "Wildtrack")

    recall, precision, moda, modp = clear_metrics(gt_rows, det_rows)
    np.testing.assert_allclose(
        [recall, precision, moda, modp], [ref_recall, ref_precision, ref_moda, ref_modp], atol=1e-6
    )


def test_reference_demo_fixtures():
    """The reference's canned metric fixtures
    (`/root/reference/multiview_detector/evaluation/{gt,test}-demo.txt`,
    exercised by `evaluation/evaluate.py:36-50`): pin the exact numbers and,
    when importable, assert parity with the reference pyeval on them."""
    from mvdetr_tpu.evaluation.clear import evaluate_files

    gt = "/root/reference/multiview_detector/evaluation/gt-demo.txt"
    det = "/root/reference/multiview_detector/evaluation/test-demo.txt"
    if not os.path.exists(gt):
        pytest.skip("reference demo fixtures unavailable")
    recall, precision, moda, modp = evaluate_files(det, gt)
    np.testing.assert_allclose(
        [recall, precision, moda, modp],
        [94.9579831932773, 93.58178053830227, 88.4453781512605, 75.60477898846452],
        rtol=1e-9,
    )

    sys.path.insert(0, "/root/reference")
    try:
        from multiview_detector.evaluation.pyeval.evaluateDetection import evaluateDetection_py
    except Exception:
        return  # pinned numbers above already asserted
    finally:
        sys.path.remove("/root/reference")
    r_recall, r_precision, r_moda, r_modp = evaluateDetection_py(det, gt, "demo")
    np.testing.assert_allclose([recall, precision, moda, modp],
                               [r_recall, r_precision, r_moda, r_modp], rtol=1e-9)
