"""Experiment driver: synthetic convergence tuning (VERDICT #2).

Runs the flagship pipeline on the synthetic scene (xy and ij rigs), printing
per-epoch loss and final MODA/precision, so the asserted floor in
tests/test_convergence.py can be raised with evidence.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mvdetr_tpu.data import FrameDataset, SyntheticScene
from mvdetr_tpu.geometry import make_synthetic_rig, make_wildtrack_like_rig
from mvdetr_tpu.models import MVDeTr
from mvdetr_tpu.train import Trainer, create_train_state


def run(indexing, epochs, lr, num_frame, num_person, seed, cls_thres, kernel,
        batch_size=2, base_lr_ratio=1.0, augmentation=False, attn_radius=4):
    if indexing == "ij":
        rig = make_wildtrack_like_rig(num_cam=4, img_shape=(96, 160), worldgrid_shape=(48, 96))
    else:
        rig = make_synthetic_rig(num_cam=4, img_shape=(96, 160), worldgrid_shape=(48, 96))
    scene = SyntheticScene(rig, num_frame=num_frame, num_person=num_person, seed=seed)
    kw = dict(world_reduce=2, img_reduce=12, top_k=16, world_kernel_size=kernel, img_kernel_size=kernel)
    train_set = FrameDataset(scene, train=True, augmentation=augmentation, **kw)
    test_set = FrameDataset(scene, train=False, **kw)

    model = MVDeTr.from_rig(rig, world_reduce=2, img_reduce=12, world_feat_arch="deform_trans",
                            bottleneck_dim=64, attn_radius=attn_radius)
    batch = next(train_set.batches(batch_size=batch_size))
    steps = (len(train_set) // batch_size) * epochs
    state = create_train_state(model, batch, lr=lr, total_steps=steps, base_lr_ratio=base_lr_ratio)
    trainer = Trainer(state, train_set, test_set, cls_thres=cls_thres, logger=lambda *a: None)
    t0 = time.time()
    for ep in range(1, epochs + 1):
        loss = trainer.train_epoch(ep, batch_size=batch_size)
        print(f"[{indexing}] epoch {ep}: loss {loss:.4f} ({time.time()-t0:.0f}s)", flush=True)
    _, moda, modp, precision, recall = trainer.test(batch_size=1)
    print(f"[{indexing}] FINAL moda {moda:.1f} modp {modp:.1f} prec {precision:.1f} recall {recall:.1f}",
          flush=True)
    return moda, precision


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--indexing", default="xy")
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--num_frame", type=int, default=40)
    p.add_argument("--num_person", type=int, default=6)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--cls_thres", type=float, default=0.4)
    p.add_argument("--kernel", type=float, default=4.0)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--attn_radius", type=int, default=4)
    a = p.parse_args()
    run(a.indexing, a.epochs, a.lr, a.num_frame, a.num_person, a.seed, a.cls_thres, a.kernel,
        batch_size=a.batch_size, attn_radius=a.attn_radius)
