"""Benchmark: flagship MVDeTr training throughput on one chip.

Measures steady-state full training steps (forward + backward + Adam update)
at Wildtrack scale — 7 cameras, 720x1280 input, 120x360 BEV grid, shadow
transformer — in frame-sets per second on the attached TPU.

Baseline note: the reference repo publishes no throughput (SURVEY §6). The
``vs_baseline`` denominator is an estimate of the reference implementation's
single-RTX-2080TI training throughput at the same workload, 1.4 frame-sets/s,
derived as: fwd+bwd FLOPs/frame-set ~7.5 TFLOP (XLA cost analysis of the
equivalent step) at the 2080TI's 13.4 TFLOP/s fp32 peak with a generous 40 %
end-to-end MFU -> ~0.7 s/step (resnet18 over 7x720x1280 + 3 deformable layers
over 75.6k tokens + the atomics-heavy CUDA backward on an 11 GB part).
The honest uncertainty band is roughly ±50 % (the real step could fall
anywhere in 0.5-1.0 s depending on CUDA kernel efficiency), so read
``vs_baseline`` as "~Nx, same order" — not a measured GPU comparison.
No GPU exists in this environment to measure the true denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mvdetr_tpu.utils.cache import enable_compilation_cache, use_fast_prng

enable_compilation_cache()
use_fast_prng()

BASELINE_TRAIN_FPS = 1.4  # estimated reference (RTX 2080TI) frame-sets/s, see module docstring


def main():
    import jax
    import numpy as np

    from mvdetr_tpu.data import FrameDataset, SyntheticScene
    from mvdetr_tpu.geometry import make_synthetic_rig
    from mvdetr_tpu.models import MVDeTr
    from mvdetr_tpu.train import create_train_state, train_step

    # Wildtrack-scale synthetic rig: 7 cams, 1080x1920 frames (resized to
    # 720x1280 by img_reduce=12), 480x1440 grid -> 120x360 BEV.
    rig = make_synthetic_rig(
        num_cam=7, img_shape=(1080, 1920), worldgrid_shape=(480, 1440),
        cell_meters=0.025, indexing="ij", worldcoord_unit=0.01, origin_offset=(-300.0, -900.0),
        camera_height_m=6.0, camera_margin_m=4.0, name="BenchWildtrack",
    )
    # batch 2 is the measured single-chip throughput sweet spot (BENCH_NOTES.md:
    # 3.35 fps @ b=1, 3.99 @ b=2, 3.72 @ b=4 — b=4 regresses on HBM pressure)
    batch_size = 2
    scene = SyntheticScene(rig, num_frame=2 * batch_size, num_person=20, seed=0)
    ds = FrameDataset(scene, train=True, world_reduce=4, img_reduce=12, top_k=100)
    batch = next(ds.batches(batch_size=batch_size))

    import jax.numpy as jnp

    # Stage the batch on device once — the steady-state input pipeline keeps
    # batches device-resident (double-buffered); re-uploading ~110 MB of
    # images per step would measure the host link, not the training step.
    batch = jax.device_put(batch)

    model = MVDeTr.from_rig(rig, world_reduce=4, img_reduce=12, world_feat_arch="deform_trans",
                            compute_dtype=jnp.bfloat16)
    state = create_train_state(model, batch, lr=5e-4, total_steps=100)

    rng = jax.random.PRNGKey(0)
    # warmup (compile). Force the loss VALUE (float(...)) rather than
    # block_until_ready: on tunneled platforms (axon) block_until_ready can
    # return before execution finishes, and value fetches are the only
    # reliable completion barrier.
    state, aux = train_step(state, batch, rng)
    float(aux["loss"])
    state, aux = train_step(state, batch, rng)
    float(aux["loss"])

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        state, aux = train_step(state, batch, rng)
    float(aux["loss"])
    dt = (time.time() - t0) / iters

    fps = batch_size / dt
    print(json.dumps({
        "metric": "train_framesets_per_s_per_chip",
        "value": round(fps, 3),
        "unit": f"frame-sets/s (7 cams, 720x1280, deform_trans, batch {batch_size})",
        "vs_baseline": round(fps / BASELINE_TRAIN_FPS, 3),
    }))


if __name__ == "__main__":
    main()
