"""One-off experiment: honest epoch throughput vs steady-state step time (TPU).

Runs a full Trainer epoch at Wildtrack scale on synthetic frames with the
production input pipeline (worker-assembled host batches + device prefetch)
and compares ms/step against the device-resident steady-state step time that
`bench.py` reports. VERDICT item 3's done-bar: within ~15 %.
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
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--num_workers", type=int, default=4)
    args = p.parse_args()

    from mvdetr_tpu.data import FrameDataset, SyntheticScene
    from mvdetr_tpu.geometry import make_synthetic_rig
    from mvdetr_tpu.models import MVDeTr
    from mvdetr_tpu.train import Trainer, create_train_state

    rig = make_synthetic_rig(
        num_cam=7, img_shape=(1080, 1920), worldgrid_shape=(480, 1440),
        cell_meters=0.025, indexing="ij", worldcoord_unit=0.01, origin_offset=(-300.0, -900.0),
        camera_height_m=6.0, camera_margin_m=4.0, name="BenchWildtrack",
    )
    scene = SyntheticScene(rig, num_frame=args.frames, num_person=20, seed=0)
    ds = FrameDataset(scene, train=True, world_reduce=4, img_reduce=12, top_k=100)

    model = MVDeTr.from_rig(rig, world_reduce=4, img_reduce=12, world_feat_arch="deform_trans",
                            compute_dtype=jnp.bfloat16)
    batch = next(ds.batches(batch_size=args.batch))
    state = create_train_state(model, batch, lr=5e-4, total_steps=1000)
    trainer = Trainer(state, ds, ds, num_workers=args.num_workers)

    trainer.train_epoch(0, batch_size=args.batch, log_interval=1000)  # compile warmup
    t0 = time.time()
    trainer.train_epoch(1, batch_size=args.batch, log_interval=1000)
    dt = time.time() - t0
    steps = args.frames // args.batch
    ms = dt / steps * 1000.0
    print(f"epoch: {steps} steps of batch {args.batch} in {dt:.1f}s -> {ms:.1f} ms/step, "
          f"{args.batch / ms * 1000:.3f} frame-sets/s (workers={args.num_workers})", flush=True)


if __name__ == "__main__":
    main()
