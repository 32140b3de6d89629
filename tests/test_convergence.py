"""End-to-end learning test: the flagship pipeline must learn the synthetic
scene (geometry-consistent rendering), driving MODA from 0 upward with full
precision. This exercises every layer boundary at once — a wrong sign
anywhere in the homography chain keeps MODA at 0 (SURVEY §7 hard part #2).

Marked slow: ~2.5 min on CPU. Run explicitly with ``-m slow`` or as part of
the default suite (kept under the driver's budget).
"""

import numpy as np
import pytest

from mvdetr_tpu.data import FrameDataset, SyntheticScene
from mvdetr_tpu.geometry import make_synthetic_rig
from mvdetr_tpu.models import MVDeTr
from mvdetr_tpu.train import Trainer, create_train_state


@pytest.mark.slow
def test_synthetic_convergence():
    rig = make_synthetic_rig(num_cam=4, img_shape=(96, 160), worldgrid_shape=(48, 96))
    scene = SyntheticScene(rig, num_frame=40, num_person=6, seed=3)
    kw = dict(world_reduce=2, img_reduce=12, top_k=16, world_kernel_size=4, img_kernel_size=4)
    train_set = FrameDataset(scene, train=True, augmentation=False, **kw)
    test_set = FrameDataset(scene, train=False, **kw)

    model = MVDeTr.from_rig(rig, world_reduce=2, img_reduce=12, world_feat_arch="deform_trans",
                            bottleneck_dim=64)
    epochs = 8
    batch = next(train_set.batches(batch_size=2))
    state = create_train_state(model, batch, lr=1e-3, total_steps=(len(train_set) // 2) * epochs,
                               base_lr_ratio=1.0)
    trainer = Trainer(state, train_set, test_set, cls_thres=0.4, logger=lambda *a: None)
    first_loss = trainer.train_epoch(1, batch_size=2)
    for ep in range(2, epochs + 1):
        last_loss = trainer.train_epoch(ep, batch_size=2)
    _, moda, modp, precision, recall = trainer.test(batch_size=1)

    assert last_loss < first_loss * 0.6, f"loss did not drop: {first_loss} -> {last_loss}"
    assert moda >= 25, f"MODA too low after training: {moda}"
    assert precision >= 80, f"precision collapsed: {precision}"
