"""Sharding tests on the virtual 8-device CPU mesh: sharded train step runs,
and 1-device vs N-device results agree (the same-seed equivalence strategy
from SURVEY §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvdetr_tpu.data import FrameDataset, SyntheticScene
from mvdetr_tpu.geometry import make_synthetic_rig
from mvdetr_tpu.models import MVDeTr
from mvdetr_tpu.parallel import make_mesh, make_sharded_train_step, replicate_state, shard_batch
from mvdetr_tpu.train import create_train_state, train_step


@pytest.fixture(scope="module")
def setup():
    rig = make_synthetic_rig(num_cam=4, img_shape=(48, 96), worldgrid_shape=(32, 64))
    scene = SyntheticScene(rig, num_frame=6, num_person=3, seed=11)
    ds = FrameDataset(scene, train=True, world_reduce=2, img_reduce=12, top_k=8)
    model = MVDeTr.from_rig(rig, world_reduce=2, img_reduce=12, world_feat_arch="deform_trans",
                            bottleneck_dim=32)
    batch = next(ds.batches(batch_size=2))
    state = create_train_state(model, batch, lr=1e-3, total_steps=10)
    return model, ds, batch, state


def _fresh(state):
    return jax.tree.map(lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, state)


def test_mesh_construction():
    mesh = make_mesh(num_view_shards=4)
    assert mesh.shape == {"data": 2, "view": 4, "bev": 1}
    mesh = make_mesh(num_view_shards=1)
    assert mesh.shape == {"data": 8, "view": 1, "bev": 1}
    mesh = make_mesh(num_view_shards=2, num_bev_shards=2)
    assert mesh.shape == {"data": 2, "view": 2, "bev": 2}


def test_sharded_train_step_matches_single_device(setup):
    model, ds, batch, state = setup
    rng = jax.random.PRNGKey(0)

    # single-device reference
    single_state, single_aux = train_step(_fresh(state), batch, rng)

    # 2 data x 4 view mesh
    mesh = make_mesh(num_view_shards=4)
    sharded_step = make_sharded_train_step(mesh)
    st = replicate_state(_fresh(state), mesh)
    sb = shard_batch(batch, mesh)
    sharded_state, sharded_aux = sharded_step(st, sb, rng)

    np.testing.assert_allclose(float(sharded_aux["loss"]), float(single_aux["loss"]), rtol=2e-4)
    # parameters after one step agree up to f32 cross-partition reduction order
    for a, b in zip(jax.tree.leaves(single_state.params), jax.tree.leaves(sharded_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_data_only_mesh(setup):
    model, ds, batch, state = setup
    mesh = make_mesh(num_view_shards=1, devices=jax.devices()[:2])  # batch=2 -> data=2
    sharded_step = make_sharded_train_step(mesh)
    st = replicate_state(_fresh(state), mesh)
    sb = shard_batch(batch, mesh)
    new_state, aux = sharded_step(st, sb, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))


def test_bev_row_sharded_windowed_attention_matches_unsharded():
    """BEV-tile halo sharding (SURVEY §2.8 long-context story): rows sharded
    over `view`, ±radius halo via ppermute — bitwise equal to one device."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from mvdetr_tpu.ops.msda_sharded import bev_row_sharded_windowed_attention
    from mvdetr_tpu.ops.msda_windowed import ms_deform_attn_windowed

    rng = np.random.default_rng(0)
    b, l, h, w, m, d, p, c, r = 1, 3, 16, 20, 2, 4, 3, 3, 3
    value = jnp.asarray(rng.standard_normal((b, l, h, w, m, d)), jnp.float32)
    off = jnp.asarray(rng.uniform(-r, r, (b, c, h, w, m, l, p, 2)), jnp.float32)
    wgt = jnp.asarray(rng.uniform(0, 1, (b, c, h, w, m, l, p)), jnp.float32)
    wgt = wgt / wgt.sum(axis=(-1, -2), keepdims=True)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4), ("data", "view"))
    out_sh = bev_row_sharded_windowed_attention(value, off, wgt, mesh, radius=r)
    out_ref = ms_deform_attn_windowed(value, off, wgt, radius=r, flatten=False)
    np.testing.assert_array_equal(np.asarray(out_sh), np.asarray(out_ref))


def test_bev_sharded_train_step_matches_single_device():
    """End-to-end: the flagship model with a bev-sharded mesh (the
    `DeformTransWorldFeat` encoder running `ops/msda_sharded.py` inside the
    jitted train step) reproduces the unsharded step. This is the VERDICT r2
    integration requirement — the halo-exchange op with a real call site."""
    rig = make_synthetic_rig(num_cam=4, img_shape=(48, 96), worldgrid_shape=(128, 64))
    scene = SyntheticScene(rig, num_frame=4, num_person=3, seed=5)
    ds = FrameDataset(scene, train=True, world_reduce=2, img_reduce=12, top_k=8)
    batch = next(ds.batches(batch_size=1))

    # Rworld 64x32 -> encoder grid 32x16; 8 bev shards x 4 rows (= radius) each
    mesh = make_mesh(num_view_shards=1, num_bev_shards=8)
    kwargs = dict(world_reduce=2, img_reduce=12, world_feat_arch="deform_trans",
                  bottleneck_dim=32, attn_mode="windowed")
    model_ref = MVDeTr.from_rig(rig, **kwargs)
    model_bev = MVDeTr.from_rig(rig, mesh=mesh, **kwargs)
    state_ref = create_train_state(model_ref, batch, lr=1e-3, total_steps=10)
    state_bev = create_train_state(model_bev, batch, lr=1e-3, total_steps=10)
    for a, b in zip(jax.tree.leaves(state_ref.params), jax.tree.leaves(state_bev.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rng = jax.random.PRNGKey(3)
    ref_state, ref_aux = train_step(_fresh(state_ref), batch, rng)
    step = make_sharded_train_step(mesh)
    st = replicate_state(_fresh(state_bev), mesh)
    sb = shard_batch(batch, mesh)
    bev_state, bev_aux = step(st, sb, rng)

    np.testing.assert_allclose(float(bev_aux["loss"]), float(ref_aux["loss"]), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(bev_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_three_axis_mesh_train_step_matches_single_device():
    """Full (data=2, view=2, bev=2) composition (SURVEY §2.8 combined
    strategy, VERDICT r4 #8): batch over ``data``, per-camera query blocks
    over ``view``, encoder rows over ``bev`` with the halo exchange — all in
    ONE jitted train step, equivalent to the single-device step."""
    rig = make_synthetic_rig(num_cam=4, img_shape=(48, 96), worldgrid_shape=(128, 64))
    scene = SyntheticScene(rig, num_frame=6, num_person=3, seed=7)
    ds = FrameDataset(scene, train=True, world_reduce=2, img_reduce=12, top_k=8)
    batch = next(ds.batches(batch_size=2))

    # Rworld 64x32 -> encoder rows 16: bev=2 shards of 8 rows (>= radius 4)
    mesh = make_mesh(num_view_shards=2, num_bev_shards=2)
    assert dict(mesh.shape) == {"data": 2, "view": 2, "bev": 2}
    kwargs = dict(world_reduce=2, img_reduce=12, world_feat_arch="deform_trans",
                  bottleneck_dim=32, attn_mode="windowed")
    model_ref = MVDeTr.from_rig(rig, **kwargs)
    model_3ax = MVDeTr.from_rig(rig, mesh=mesh, **kwargs)
    state_ref = create_train_state(model_ref, batch, lr=1e-3, total_steps=10)
    state_3ax = create_train_state(model_3ax, batch, lr=1e-3, total_steps=10)

    rng = jax.random.PRNGKey(9)
    ref_state, ref_aux = train_step(_fresh(state_ref), batch, rng)
    step = make_sharded_train_step(mesh)
    new_state, aux = step(replicate_state(_fresh(state_3ax), mesh), shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(aux["loss"]), float(ref_aux["loss"]), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
