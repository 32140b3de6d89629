"""CLI smoke test: one tiny synthetic epoch end-to-end through the argparse
driver (logdir convention, logger tee, checkpointing, final test eval)."""

import os

import pytest


@pytest.mark.slow
def test_cli_synthetic_epoch(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from mvdetr_tpu.cli import main

    trainer = main([
        "-d", "synthetic",
        "--epochs", "1",
        "--world_feat", "conv",
        "--synthetic_cams", "2",
        "--synthetic_frames", "8",
        "--synthetic_img", "48", "96",
        "--synthetic_grid", "32", "64",
        "--world_reduce", "2",
        "--augmentation", "false",
        "--cls_thres", "0.3",
        "--batch_size", "2",
    ])
    # logdir artifacts written
    logdirs = [d for d in (tmp_path / "logs" / "synthetic").iterdir()]
    assert len(logdirs) == 1
    assert (logdirs[0] / "log.txt").exists()
    assert (logdirs[0] / "test.txt").exists()
    assert (logdirs[0] / "checkpoints").exists()
    assert trainer is not None


def test_cli_parser_defaults():
    from mvdetr_tpu.cli import build_parser

    args = build_parser().parse_args([])
    # reference defaults (`main.py:152-183`)
    assert args.lr == 5e-4 and args.epochs == 10 and args.batch_size == 1
    assert args.world_feat == "deform_trans" and args.seed == 2021
    assert args.world_reduce == 4 and args.img_reduce == 12
    assert args.cls_thres == 0.6 and args.alpha == 1.0 and args.base_lr_ratio == 0.1


def test_suggest_attn_radius():
    """Checkpoint-driven radius auto-pick (interop.suggest_attn_radius):
    ceil(max |sampling_offsets bias|) + 1, clamped to [4, 8]."""
    import numpy as np

    from mvdetr_tpu.interop import suggest_attn_radius

    sd = {
        "world_feat.encoder.layers.0.self_attn.sampling_offsets.bias": np.full(16, 2.0),
        "world_feat.encoder.layers.1.self_attn.sampling_offsets.bias": np.array([-5.3, 1.0]),
        "world_feat.encoder.layers.0.self_attn.sampling_offsets.weight": np.zeros((16, 4)),
    }
    assert suggest_attn_radius(sd) == (7, 5.3)
    # no offsets head at all (conv checkpoint): conservative default
    assert suggest_attn_radius({"x": np.ones(3)}) == (4, 0.0)
    # extreme reach clamps to 16 (the grid-axis kernel's practical eval
    # ceiling; gather stays the exact path beyond)
    r, reach = suggest_attn_radius({"a.sampling_offsets.bias": np.array([55.0])})
    assert r == 16 and reach == 55.0
    # module.-prefixed (DataParallel-style) keys are normalized
    assert suggest_attn_radius({"module.a.sampling_offsets.bias": np.array([3.5])})[0] == 5


@pytest.mark.slow
def test_cli_resume_train_continues_epochs(tmp_path, monkeypatch):
    """--epochs_per_process budget + --resume_train: the second process
    restores the FULL train state (optimizer + schedule step) and continues
    at the right epoch with the loss still descending (the per-epoch
    process-recycling workaround for the axon H2D host-pinning)."""
    import numpy as np

    monkeypatch.chdir(tmp_path)
    from mvdetr_tpu.cli import main

    base = [
        "-d", "synthetic", "--epochs", "3", "--world_feat", "conv",
        "--synthetic_cams", "2", "--synthetic_frames", "8",
        "--synthetic_img", "48", "96", "--synthetic_grid", "32", "64",
        "--world_reduce", "2", "--augmentation", "false",
        "--cls_thres", "0.3", "--batch_size", "2",
        "--logdir", str(tmp_path / "run"),
    ]
    import sys

    t1 = main(base + ["--epochs_per_process", "1"])
    sys.stdout = sys.__stdout__  # drop the CLI's tee (real usage: one per process)
    step1 = int(t1.state.step)
    assert step1 > 0  # exactly one epoch's worth of steps ran

    t2 = main(base + ["--resume_train", str(tmp_path / "run")])
    sys.stdout = sys.__stdout__
    assert int(t2.state.step) > step1
    log = (tmp_path / "run" / "log.txt").read_text()
    assert "continuing at epoch 2/3" in log
    assert log.count("=== epoch") == 3  # appended, not truncated
