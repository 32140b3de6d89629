"""End-to-end learning test: the flagship pipeline must nearly solve the
synthetic scene (geometry-consistent rendering), reaching MODA >= 85 with
precision >= 90 — the synthetic-scene analogue of the reference's 91.5 %
Wildtrack contract (`/root/reference/README.md:66`). This exercises every
layer boundary at once — a wrong sign anywhere in the homography chain keeps
MODA at 0 (SURVEY §7 hard part #2); a transposed world target (the round-1 ij
bug) caps recall.

Runs on both grid conventions: an xy rig (MultiviewX-style) and an ij rig
(Wildtrack-style: ij indexing, centimeter units, offset origin).

Marked slow: ~4 min each on CPU.
"""

import numpy as np
import pytest

from mvdetr_tpu.data import FrameDataset, SyntheticScene
from mvdetr_tpu.geometry import make_synthetic_rig
from mvdetr_tpu.models import MVDeTr
from mvdetr_tpu.train import Trainer, create_train_state


def _run_convergence(rig, seed=2021):
    scene = SyntheticScene(rig, num_frame=12, num_person=8, seed=seed)
    kw = dict(world_reduce=4, img_reduce=12, top_k=32, world_kernel_size=10, img_kernel_size=10)
    train_set = FrameDataset(scene, train=True, augmentation=True, seed=seed, **kw)
    test_set = FrameDataset(scene, train=False, seed=seed, **kw)

    model = MVDeTr.from_rig(rig, world_reduce=4, img_reduce=12, world_feat_arch="deform_trans")
    epochs = 10
    batch = next(train_set.batches(batch_size=1))
    state = create_train_state(model, batch, lr=1e-3, total_steps=len(train_set) * epochs)
    trainer = Trainer(state, train_set, test_set, cls_thres=0.4, logger=lambda *a: None)
    first_loss = trainer.train_epoch(1, batch_size=1)
    for ep in range(2, epochs + 1):
        last_loss = trainer.train_epoch(ep, batch_size=1)
    _, moda, modp, precision, recall = trainer.test(batch_size=1)
    return first_loss, last_loss, moda, precision


@pytest.mark.slow
def test_synthetic_convergence_xy():
    rig = make_synthetic_rig(num_cam=4, img_shape=(180, 320), worldgrid_shape=(120, 240))
    first_loss, last_loss, moda, precision = _run_convergence(rig)
    assert last_loss < first_loss * 0.5, f"loss did not drop: {first_loss} -> {last_loss}"
    assert moda >= 85, f"MODA too low after training: {moda}"
    assert precision >= 90, f"precision collapsed: {precision}"


@pytest.mark.slow
def test_synthetic_convergence_ij():
    """Wildtrack-convention rig: ij indexing, cm units, offset grid origin."""
    rig = make_synthetic_rig(
        num_cam=4, img_shape=(180, 320), worldgrid_shape=(120, 240),
        cell_meters=0.025, indexing="ij", worldcoord_unit=0.01,
        origin_offset=(-150.0, -450.0), name="SyntheticWildtrackBig",
    )
    first_loss, last_loss, moda, precision = _run_convergence(rig)
    assert last_loss < first_loss * 0.5, f"loss did not drop: {first_loss} -> {last_loss}"
    assert moda >= 85, f"MODA too low after training: {moda}"
    assert precision >= 90, f"precision collapsed: {precision}"
