"""One-off experiment: backbone remat vs batch scaling (TPU).

Measures steady-state train-step time at batch {2,4} with and without
backbone block rematerialization. Not part of the suite — feeds BENCH notes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvdetr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


_RIG = None
_BATCHES = {}


def get_batch(batch_size: int):
    global _RIG
    from mvdetr_tpu.data import FrameDataset, SyntheticScene
    from mvdetr_tpu.geometry import make_synthetic_rig

    if _RIG is None:
        _RIG = make_synthetic_rig(
            num_cam=7, img_shape=(1080, 1920), worldgrid_shape=(480, 1440),
            cell_meters=0.025, indexing="ij", worldcoord_unit=0.01, origin_offset=(-300.0, -900.0),
            camera_height_m=6.0, camera_margin_m=4.0, name="BenchWildtrack",
        )
    if batch_size not in _BATCHES:
        scene = SyntheticScene(_RIG, num_frame=2 * batch_size, num_person=20, seed=0)
        ds = FrameDataset(scene, train=True, world_reduce=4, img_reduce=12, top_k=100)
        _BATCHES[batch_size] = jax.device_put(next(ds.batches(batch_size=batch_size)))
        print(f"  [data ready b={batch_size}]", flush=True)
    return _BATCHES[batch_size]


def measure(batch_size: int, remat: bool, iters: int = 10) -> float:
    from mvdetr_tpu.models import MVDeTr
    from mvdetr_tpu.train import create_train_state, train_step

    batch = get_batch(batch_size)
    model = MVDeTr.from_rig(_RIG, world_reduce=4, img_reduce=12, world_feat_arch="deform_trans",
                            compute_dtype=jnp.bfloat16, remat_backbone=remat)
    state = create_train_state(model, batch, lr=5e-4, total_steps=100)

    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    state, aux = train_step(state, batch, rng)
    float(aux["loss"])
    print(f"  [compiled b={batch_size} remat={remat} in {time.time() - t0:.0f}s]", flush=True)
    state, aux = train_step(state, batch, rng)
    float(aux["loss"])

    t0 = time.time()
    for _ in range(iters):
        state, aux = train_step(state, batch, rng)
    float(aux["loss"])
    return (time.time() - t0) / iters * 1000.0


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="2,4")
    p.add_argument("--remat", type=str, default="0,1")
    args = p.parse_args()
    for bs in [int(x) for x in args.batches.split(",")]:
        for remat in [bool(int(x)) for x in args.remat.split(",")]:
            ms = measure(bs, remat)
            print(f"batch={bs} remat={remat}: {ms:.1f} ms/step, "
                  f"{bs / ms * 1000:.3f} frame-sets/s", flush=True)
