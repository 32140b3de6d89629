"""Windowed-clamp stress A/B (VERDICT r2 #5).

The easy synthetic benchmark saturates at the same MODA for windowed and
gather attention, which says nothing about the radius-4 clamp under stress.
This driver builds a deliberately hard scene — dense crowd, LOW cameras (long
shadows stretching across the BEV grid, heavy occlusion) — and A/Bs:

  - windowed (radius-4 clamp, the TPU fast path) vs gather (reference
    semantics, unbounded offsets),
  - 4-point (identity refs) vs 8-point (shadow reference maps).

Prints per-config final MODA/precision plus the trained offset-clip fraction
(the fraction of learned offsets the clamp actually bites on — also logged
during CLI training every log_interval).

Usage: python scripts/stress_ab.py [--epochs 10] [--modes windowed gather]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvdetr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np

from mvdetr_tpu.data import FrameDataset, SyntheticScene
from mvdetr_tpu.geometry import make_synthetic_rig
from mvdetr_tpu.models import MVDeTr
from mvdetr_tpu.train import Trainer, create_train_state


def run(mode: str, n_points: int, epochs: int, seed: int = 3):
    # low cameras -> shadows stretch far across the BEV plane; dense crowd ->
    # occlusion; this is where a too-tight clamp starves the attention's reach
    rig = make_synthetic_rig(
        num_cam=4, img_shape=(96, 160), worldgrid_shape=(48, 96),
        camera_height_m=2.0, camera_margin_m=1.0, name="Stress",
    )
    scene = SyntheticScene(rig, num_frame=40, num_person=20, seed=seed)
    kw = dict(world_reduce=2, img_reduce=12, top_k=32, world_kernel_size=4, img_kernel_size=4)
    train_set = FrameDataset(scene, train=True, augmentation=True, **kw)
    test_set = FrameDataset(scene, train=False, **kw)

    model = MVDeTr.from_rig(rig, world_reduce=2, img_reduce=12, world_feat_arch="deform_trans",
                            bottleneck_dim=64, attn_mode=mode, n_points=n_points)
    batch = next(train_set.batches(batch_size=2))
    steps = (len(train_set) // 2) * epochs
    state = create_train_state(model, batch, lr=1e-3, total_steps=steps, base_lr_ratio=1.0)
    trainer = Trainer(state, train_set, test_set, cls_thres=0.4, logger=lambda *a: None)
    t0 = time.time()
    for ep in range(1, epochs + 1):
        trainer.train_epoch(ep, batch_size=2)
    # final clip fraction from one probe step (same aux the CLI logs)
    probe = next(iter(trainer._batches(2)))
    pstate = jax.tree.map(lambda x: x + 0 if hasattr(x, "dtype") else x, trainer.state)
    _, aux = trainer._step_on(pstate, probe, jax.random.PRNGKey(0))
    clip = float(aux.get("offset_clip_fraction", float("nan")))
    _, moda, modp, precision, recall = trainer.test(batch_size=1)
    label = f"{mode}/P{n_points}"
    print(f"{label:16s} moda {moda:5.1f}  modp {modp:5.1f}  prec {precision:5.1f}  "
          f"recall {recall:5.1f}  clip_frac {clip:.4f}  ({time.time() - t0:.0f}s)", flush=True)
    return moda, precision, clip


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--modes", nargs="+", default=["windowed", "gather"])
    p.add_argument("--points", type=int, nargs="+", default=[4])
    p.add_argument("--seed", type=int, default=3)
    a = p.parse_args()
    print("stress scene: 4 cams at 2.0 m height, 20 people on a 48x96 BEV grid, occlusion")
    for n_points in a.points:
        for mode in a.modes:
            if n_points == 8 and mode == "windowed":
                mode = "warped"  # 8-point shadow refs ride the warped fast path
            run(mode, n_points, a.epochs, a.seed)
