"""Real-data day-one dress rehearsal at full Wildtrack scale.

The contract run (91.5 % MODA) needs: 7x 1080x1920 JPEG decodes + affine +
resize per frame-set on the HOST, feeding a 480x1440-grid model on the chip at
the training rate. None of that is exercised by the device-resident synthetic
benchmarks, so this script measures it before real data ever shows up:

1. materializes N frame-sets of synthetic 1080p JPEGs on disk (content from
   `SyntheticScene`, so annotations stay consistent),
2. measures the host input pipeline (decode + augment + resize + targets) in
   frame-sets/s across a worker sweep — the chip needs ~4/s at BENCH_r02 rate,
3. optionally (--train_steps) runs real train steps at the full 480x1440 /
   720x1280 scale with the on-disk pipeline to expose starvation and HBM
   pressure end to end.

Usage: python scripts/rehearse_realscale.py [--frames 24] [--train_steps 8]
"""

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class DiskJpegScene:
    """SceneSource that serves a base scene's images from JPEG files on disk —
    the decode path real Wildtrack data takes (`frameDataset.py:198` analogue,
    PIL decode per (cam, frame))."""

    def __init__(self, base, root: str, quality: int = 90):
        from PIL import Image

        self.rig = base.rig
        self.num_frame = base.num_frame
        self._base = base
        self._root = root
        os.makedirs(root, exist_ok=True)
        t0 = time.time()
        self._paths = {}
        for frame in base.frames():
            for cam in range(base.rig.num_cam):
                path = os.path.join(root, f"c{cam}_f{frame:05d}.jpg")
                if not os.path.exists(path):
                    Image.fromarray(base.image(cam, frame)).save(path, quality=quality)
                self._paths[(cam, frame)] = path
        n = len(self._paths)
        sz = sum(os.path.getsize(p) for p in self._paths.values()) / 1e6
        print(f"materialized {n} JPEGs ({sz:.0f} MB) in {time.time() - t0:.1f}s")

    def frames(self):
        return self._base.frames()

    def annotation(self, frame):
        return self._base.annotation(frame)

    def image(self, cam, frame):
        from mvdetr_tpu.data.dataset import load_image_rgb

        return load_image_rgb(self._paths[(cam, frame)])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--workers", type=int, nargs="+", default=[0, 4, 8, 16])
    p.add_argument("--root", type=str, default="/tmp/rehearse_wildtrack")
    p.add_argument("--train_steps", type=int, default=0,
                   help="also run this many real train steps at full scale on the device")
    args = p.parse_args()

    from mvdetr_tpu.data import FrameDataset, SyntheticScene
    from mvdetr_tpu.geometry import make_synthetic_rig

    rig = make_synthetic_rig(
        num_cam=7, img_shape=(1080, 1920), worldgrid_shape=(480, 1440),
        cell_meters=0.025, indexing="ij", worldcoord_unit=0.01, origin_offset=(-300.0, -900.0),
        camera_height_m=6.0, camera_margin_m=4.0, name="RehearseWildtrack",
    )
    base = SyntheticScene(rig, num_frame=args.frames, num_person=20, seed=0)
    scene = DiskJpegScene(base, args.root)
    ds = FrameDataset(scene, train=True, world_reduce=4, img_reduce=12, top_k=100,
                      augmentation=True)

    # ---- host pipeline sweep (decode + affine + resize + targets)
    print(f"host input pipeline, {len(ds)} frame-sets on disk, batch {args.batch}:")
    for nw in args.workers:
        t0 = time.time()
        count = 0
        for batch in ds.batches(args.batch, num_workers=nw):
            count += batch["imgs"].shape[0]
        dt = time.time() - t0
        print(f"  num_workers={nw:3d}: {count / dt:6.2f} frame-sets/s host "
              f"({dt / count * 1000:.0f} ms/frame-set)")

    if args.train_steps:
        import jax

        from mvdetr_tpu.data.prefetch import prefetch_to_device
        from mvdetr_tpu.models import MVDeTr
        from mvdetr_tpu.train import create_train_state, train_step
        import jax.numpy as jnp

        print("building full-scale model (480x1440 grid, 720x1280 inputs)...")
        model = MVDeTr.from_rig(rig, world_reduce=4, img_reduce=12,
                                world_feat_arch="deform_trans", compute_dtype=jnp.bfloat16)
        first = next(ds.batches(args.batch, num_workers=8))
        state = create_train_state(model, first, lr=5e-4, total_steps=100)
        rng = jax.random.PRNGKey(0)

        steps, t_compile = 0, None
        t0 = time.time()
        it = ds.batches(args.batch, num_workers=8)
        for batch in prefetch_to_device(it, size=2):
            state, aux = train_step(state, batch, rng)
            if steps == 0:
                float(aux["loss"])  # compile barrier
                t_compile = time.time() - t0
                t0 = time.time()
            steps += 1
            if steps > args.train_steps:
                break
        float(aux["loss"])
        dt = (time.time() - t0) / max(steps - 1, 1)
        print(f"compile {t_compile:.1f}s; steady-state {dt * 1000:.0f} ms/step with the DISK "
              f"pipeline = {args.batch / dt:.2f} frame-sets/s (device-resident bench is the "
              f"no-input-bound ceiling)")


if __name__ == "__main__":
    main()
