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
