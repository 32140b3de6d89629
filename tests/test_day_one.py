"""Day-one command path, end-to-end: ``cli.py -d wildtrack --data_root <tree>``.

Generates complete on-disk Wildtrack/MultiviewX-format trees (full-resolution
1080x1920 JPEGs, calibration XMLs, JSON annotations) from a synthetic scene
and drives the exact CLI command a user will run on real data — through the
real adapters (`data/adapters.py`), FrameDataset, training, eval, checkpoint,
and resume (reference path: `/root/reference/main.py:50-73,130-147`,
`datasets/frameDataset.py:177-236`). Marked slow: full-res JPEG IO + CPU
training dominate.
"""

import os

import numpy as np
import pytest

from tests._fixture_trees import (
    multiviewx_like_scene,
    wildtrack_like_scene,
    write_multiviewx_tree,
    write_wildtrack_tree,
)


@pytest.mark.slow
def test_day_one_wildtrack_cli(tmp_path, monkeypatch):
    scene = wildtrack_like_scene(num_frame=10, num_person=10)
    root = tmp_path / "Wildtrack"
    write_wildtrack_tree(str(root), scene)
    # sanity: the on-disk tree is complete
    assert len(os.listdir(root / "Image_subsets")) == 7
    assert len(os.listdir(root / "annotations_positions")) == 10

    monkeypatch.chdir(tmp_path)
    from mvdetr_tpu.cli import main

    args = [
        "-d", "wildtrack",
        "--data_root", str(root),
        "--epochs", "1",
        "--world_reduce", "8",
        "--img_reduce", "24",
        "--num_workers", "2",
        "--cls_thres", "0.3",
    ]
    trainer = main(args)
    assert trainer is not None

    logdirs = list((tmp_path / "logs" / "wildtrack").iterdir())
    assert len(logdirs) == 1
    logdir = logdirs[0]
    assert (logdir / "log.txt").exists()
    assert (logdir / "test.txt").exists()
    assert (logdir / "checkpoints").exists()
    res = np.loadtxt(logdir / "test.txt").reshape(-1, 3) if (logdir / "test.txt").stat().st_size else None

    # resume: weights-only reload from the checkpoint, then eval (`main.py:143-147`)
    trainer2 = main(args + ["--resume", logdir.name])
    assert trainer2 is not None
    res2 = np.loadtxt(logdir / "test.txt")
    if res is not None and res2.size:
        np.testing.assert_allclose(res2.reshape(-1, 3), res)


@pytest.mark.slow
def test_day_one_multiviewx_cli(tmp_path, monkeypatch):
    scene = multiviewx_like_scene(num_frame=6, num_person=8)
    root = tmp_path / "MultiviewX"
    write_multiviewx_tree(str(root), scene)

    monkeypatch.chdir(tmp_path)
    from mvdetr_tpu.cli import main

    trainer = main([
        "-d", "multiviewx",
        "--data_root", str(root),
        "--epochs", "1",
        "--world_feat", "conv",
        "--use_mse", "true",
        "--world_reduce", "16",
        "--img_reduce", "48",
        "--num_workers", "2",
        "--cls_thres", "0.3",
    ])
    assert trainer is not None
    logdirs = list((tmp_path / "logs" / "multiviewx").iterdir())
    assert (logdirs[0] / "test.txt").exists()
