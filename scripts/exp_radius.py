"""One-off experiment: attention window radius vs step time (TPU).

The windowed kernel's cost scales with the (2R+1)^2 shift count (81 at the
default R=4, 49 at R=3). The radial offset-bias init rescales to the radius
(`models/deformable.py:44-45`), so smaller windows stay well-initialized.
Accuracy impact is measured separately via scripts/tune_convergence.py.
Not part of the suite — feeds BENCH notes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvdetr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--radii", type=str, default="4,3,2")
    args = p.parse_args()

    from mvdetr_tpu.data import FrameDataset, SyntheticScene
    from mvdetr_tpu.geometry import make_synthetic_rig
    from mvdetr_tpu.models import MVDeTr
    from mvdetr_tpu.train import create_train_state, train_step

    rig = make_synthetic_rig(
        num_cam=7, img_shape=(1080, 1920), worldgrid_shape=(480, 1440),
        cell_meters=0.025, indexing="ij", worldcoord_unit=0.01, origin_offset=(-300.0, -900.0),
        camera_height_m=6.0, camera_margin_m=4.0, name="BenchWildtrack",
    )
    scene = SyntheticScene(rig, num_frame=2 * args.batch, num_person=20, seed=0)
    ds = FrameDataset(scene, train=True, world_reduce=4, img_reduce=12, top_k=100)
    batch = jax.device_put(next(ds.batches(batch_size=args.batch)))

    rng = jax.random.PRNGKey(0)
    for r in [int(x) for x in args.radii.split(",")]:
        model = MVDeTr.from_rig(rig, world_reduce=4, img_reduce=12,
                                world_feat_arch="deform_trans",
                                compute_dtype=jnp.bfloat16, attn_radius=r)
        state = create_train_state(model, batch, lr=5e-4, total_steps=100)
        t0 = time.time()
        state, aux = train_step(state, batch, rng)
        float(aux["loss"])
        print(f"  [compiled R={r} in {time.time() - t0:.0f}s]", flush=True)
        state, aux = train_step(state, batch, rng)
        float(aux["loss"])
        t0 = time.time()
        iters = 10
        for _ in range(iters):
            state, aux = train_step(state, batch, rng)
        float(aux["loss"])
        ms = (time.time() - t0) / iters * 1000.0
        print(f"radius={r}: {ms:.1f} ms/step, {args.batch / ms * 1000:.3f} frame-sets/s",
              flush=True)


if __name__ == "__main__":
    main()
