"""Training engine tests: schedule parity vs torch OneCycleLR, loss parity,
train-step smoke, checkpoint roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvdetr_tpu.data import FrameDataset, SyntheticScene
from mvdetr_tpu.geometry import make_synthetic_rig
from mvdetr_tpu.losses import focal_loss, reg_l1_loss
from mvdetr_tpu.models import MVDeTr
from mvdetr_tpu.train import (
    Trainer,
    create_train_state,
    eval_step,
    onecycle_b1_schedule,
    onecycle_lr_schedule,
    restore_checkpoint,
    save_checkpoint,
    train_step,
)


def test_onecycle_matches_torch():
    torch = pytest.importorskip("torch")
    total, peak = 50, 1e-3
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=peak)
    sched = torch.optim.lr_scheduler.OneCycleLR(opt, max_lr=peak, total_steps=total)
    lr_fn = onecycle_lr_schedule(peak, total)
    b1_fn = onecycle_b1_schedule(total)
    for step in range(total):
        torch_lr = sched.get_last_lr()[0]
        torch_b1 = opt.param_groups[0]["betas"][0]
        np.testing.assert_allclose(float(lr_fn(step)), torch_lr, rtol=1e-5, atol=1e-9)
        np.testing.assert_allclose(float(b1_fn(step)), torch_b1, rtol=1e-5)
        opt.step()
        sched.step()


def test_focal_loss_matches_torch_formula(rng):
    torch = pytest.importorskip("torch")
    logits = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
    target = np.zeros((2, 8, 8, 1), dtype=np.float32)
    target[0, 3, 4, 0] = 1.0
    target[0, 3, 5, 0] = 0.6
    target[1, 2, 2, 0] = 1.0

    t_out = torch.sigmoid(torch.from_numpy(logits)).clamp(1e-4, 1 - 1e-4)
    t_tgt = torch.from_numpy(target)
    pos = t_tgt.eq(1).float()
    neg = t_tgt.lt(1).float()
    pos_loss = (torch.log(t_out) * (1 - t_out) ** 2 * pos).sum()
    neg_loss = (torch.log(1 - t_out) * t_out**2 * (1 - t_tgt) ** 4 * neg).sum()
    expect = -(pos_loss + neg_loss) / pos.sum()

    ours = focal_loss(jnp.asarray(logits), jnp.asarray(target))
    np.testing.assert_allclose(float(ours), float(expect), rtol=1e-5)


def test_reg_l1_loss_gather(rng):
    out = rng.standard_normal((1, 4, 6, 2)).astype(np.float32)
    idx = np.array([[2 * 6 + 3, 0, 0]])
    mask = np.array([[True, False, False]])
    target = np.zeros((1, 3, 2), dtype=np.float32)
    target[0, 0] = [0.5, -0.5]
    loss = reg_l1_loss(jnp.asarray(out), jnp.asarray(mask), jnp.asarray(idx), jnp.asarray(target))
    expect = (abs(out[0, 2, 3, 0] - 0.5) + abs(out[0, 2, 3, 1] + 0.5)) / (2 + 1e-4)
    np.testing.assert_allclose(float(loss), expect, rtol=1e-4)


@pytest.fixture(scope="module")
def tiny_setup():
    rig = make_synthetic_rig(num_cam=2, img_shape=(48, 96), worldgrid_shape=(32, 64))
    scene = SyntheticScene(rig, num_frame=8, num_person=3, seed=5)
    train_set = FrameDataset(scene, train=True, world_reduce=2, img_reduce=12, top_k=8,
                             world_kernel_size=4, img_kernel_size=4)
    test_set = FrameDataset(scene, train=False, world_reduce=2, img_reduce=12, top_k=8,
                            world_kernel_size=4, img_kernel_size=4)
    model = MVDeTr.from_rig(rig, world_reduce=2, img_reduce=12, world_feat_arch="conv",
                            bottleneck_dim=32)
    batch = next(train_set.batches(batch_size=2))
    state = create_train_state(model, batch, lr=1e-3, total_steps=20)
    return model, train_set, test_set, batch, state


def _fresh(state):
    """Deep-copy device buffers — train_step donates its input state."""
    return jax.tree.map(lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, state)


def test_train_step_decreases_loss(tiny_setup):
    _, _, _, batch, state = tiny_setup
    state = _fresh(state)
    rng = jax.random.PRNGKey(0)
    state, aux0 = train_step(state, batch, rng)
    for _ in range(8):
        state, aux = train_step(state, batch, rng)
    assert float(aux["loss"]) < float(aux0["loss"])
    assert np.isfinite(float(aux["loss"]))


def test_eval_step_shapes(tiny_setup):
    _, train_set, test_set, batch, state = tiny_setup
    aux, xys, keep = eval_step(state, batch, world_reduce=2, num_candidates=64)
    assert xys.shape == (2, 64, 3)
    assert keep.shape == (2, 64)
    assert keep.dtype == jnp.bool_


def test_eval_reports_clip_fraction_for_windowed_attention():
    """Eval-time clamp telemetry (the signal a converted-checkpoint eval on a
    fast attention mode relies on — interop.py guidance)."""
    rig = make_synthetic_rig(num_cam=2, img_shape=(48, 96), worldgrid_shape=(32, 64))
    scene = SyntheticScene(rig, num_frame=4, num_person=3, seed=5)
    ds = FrameDataset(scene, train=True, world_reduce=2, img_reduce=12, top_k=8,
                      world_kernel_size=4, img_kernel_size=4)
    model = MVDeTr.from_rig(rig, world_reduce=2, img_reduce=12,
                            world_feat_arch="deform_trans", bottleneck_dim=32,
                            attn_mode="windowed")
    batch = next(ds.batches(batch_size=1))
    state = create_train_state(model, batch, lr=1e-3, total_steps=10)
    aux, _, _ = eval_step(state, batch, world_reduce=2, num_candidates=16)
    assert "offset_clip_fraction" in aux
    assert 0.0 <= float(aux["offset_clip_fraction"]) <= 1.0


def test_trainer_end_to_end(tiny_setup, tmp_path):
    model, train_set, test_set, batch, state = tiny_setup
    trainer = Trainer(_fresh(state), train_set, test_set, cls_thres=0.3, logger=lambda *a: None)
    loss = trainer.train_epoch(1, batch_size=2)
    assert np.isfinite(loss)
    test_loss, moda, modp, prec, recall = trainer.test(batch_size=1, res_fpath=str(tmp_path / "test.txt"))
    assert np.isfinite(test_loss)
    assert 0 <= moda <= 100


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    _, _, _, batch, state = tiny_setup
    state, _ = train_step(_fresh(state), batch, jax.random.PRNGKey(1))
    path = save_checkpoint(str(tmp_path / "ckpt"), state)
    # perturb, then restore
    perturbed = state.replace(params=jax.tree.map(lambda x: x * 0, state.params))
    restored = restore_checkpoint(str(tmp_path / "ckpt"), perturbed)
    orig_leaf = jax.tree.leaves(state.params)[0]
    rest_leaf = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(orig_leaf), np.asarray(rest_leaf))
    assert int(restored.step) == int(state.step)


def test_reg_ce_loss_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from mvdetr_tpu.losses import reg_ce_loss

    out = rng.standard_normal((1, 4, 6, 5)).astype(np.float32)
    idx = np.array([[7, 3, 0]])
    mask = np.array([[True, True, False]])
    target = np.array([[2, 4, 0]])
    ours = float(reg_ce_loss(jnp.asarray(out), jnp.asarray(mask), jnp.asarray(idx), jnp.asarray(target)))

    t_out = torch.from_numpy(out.reshape(1, 24, 5))
    pred = t_out[0, [7, 3]]
    expect = F.cross_entropy(pred, torch.tensor([2, 4]), reduction="sum") / (2 + 1e-4)
    np.testing.assert_allclose(ours, float(expect), rtol=1e-5)


def test_gaussian_smoothed_mse_runs(rng):
    from mvdetr_tpu.losses import gaussian_smoothed_mse_loss

    out = jnp.zeros((1, 8, 12, 1))
    target = jnp.zeros((1, 32, 48, 1)).at[0, 16, 24, 0].set(1.0)
    loss = gaussian_smoothed_mse_loss(out, target, kernel_size=8)
    assert float(loss) > 0 and np.isfinite(float(loss))


def test_check_determinism(tiny_setup):
    """`--deterministic` contract (SURVEY §5): the train step is bitwise
    reproducible from identical state/batch/rng."""
    _, train_set, test_set, _, state = tiny_setup
    trainer = Trainer(_fresh(state), train_set, test_set, logger=lambda *a: None)
    trainer.check_determinism(batch_size=2)  # asserts internally


def test_profile_trace_dump(tiny_setup, tmp_path):
    """--profile analogue: epoch-1 steps 2-4 produce a jax.profiler trace
    directory (SURVEY §5 tracing; the reference has wall-clock meters only)."""
    _, train_set, test_set, _, state = tiny_setup
    trace_dir = tmp_path / "trace"
    trainer = Trainer(_fresh(state), train_set, test_set, logger=lambda *a: None,
                      profile_dir=str(trace_dir))
    trainer.train_epoch(1, batch_size=2)
    dumped = list(trace_dir.rglob("*.pb")) + list(trace_dir.rglob("*.json.gz")) \
        + list(trace_dir.rglob("*.xplane.pb"))
    assert trace_dir.exists() and dumped, f"no trace files under {trace_dir}"
