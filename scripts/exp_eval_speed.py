"""Eval-step breakdown + peak-filter experiment (VERDICT r3 #8).

Times, at flagship scale on the attached TPU:
- the full eval step (forward + dense decode + top-K + NMS) as shipped,
- the forward alone,
- the decode/top-K/NMS block alone, at several candidate budgets,
- the same with a 3x3 peak filter (`ops/decode.heatmap_peaks`, the
  reference's commented `_nms`, `decode.py:7-11`) before top-K.

Usage: python scripts/exp_eval_speed.py [--batch 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvdetr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def timeit(f, *a, iters=20):
    r = f(*a)
    float(jnp.sum(jax.tree.leaves(r)[0][..., :1]))
    t0 = time.time()
    for _ in range(iters):
        r = f(*a)
    float(jnp.sum(jax.tree.leaves(r)[0][..., :1]))
    return (time.time() - t0) / iters * 1000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args()

    from mvdetr_tpu.data import FrameDataset, SyntheticScene
    from mvdetr_tpu.geometry import make_synthetic_rig
    from mvdetr_tpu.models import MVDeTr
    from mvdetr_tpu.ops.decode import heatmap_peaks, mvdet_decode
    from mvdetr_tpu.ops.nms import distance_nms
    from mvdetr_tpu.train import create_train_state
    from mvdetr_tpu.train.trainer import eval_step

    rig = make_synthetic_rig(
        num_cam=7, img_shape=(1080, 1920), worldgrid_shape=(480, 1440),
        cell_meters=0.025, indexing="ij", worldcoord_unit=0.01, origin_offset=(-300.0, -900.0),
        camera_height_m=6.0, camera_margin_m=4.0, name="BenchWildtrack",
    )
    scene = SyntheticScene(rig, num_frame=max(4, 2 * args.batch), num_person=20, seed=0)
    ds = FrameDataset(scene, train=True, world_reduce=4, img_reduce=12, top_k=100)
    batch = jax.device_put(next(ds.batches(batch_size=args.batch)))

    model = MVDeTr.from_rig(rig, world_reduce=4, img_reduce=12, world_feat_arch="deform_trans",
                            compute_dtype=jnp.bfloat16)
    state = create_train_state(model, batch, lr=5e-4, total_steps=100)

    t_full = timeit(jax.jit(lambda s, b: eval_step(s, b)[1]), state, batch)
    print(f"eval step (as shipped, k=512): {t_full:7.1f} ms  "
          f"({args.batch / (t_full / 1000):.1f} fs/s)")

    fwd = jax.jit(lambda s, b: s.apply_fn(
        {"params": s.params, "batch_stats": s.batch_stats}, b["imgs"], b["affine_mats"], train=False
    )[0])
    t_fwd = timeit(fwd, state, batch)
    print(f"forward only                 : {t_fwd:7.1f} ms")

    whm, woff = fwd(state, batch)
    whm, woff = jax.device_put(whm), jax.device_put(woff)

    def tail(whm, woff, k, peaks):
        score = jax.nn.sigmoid(whm)
        if peaks:
            score = heatmap_peaks(score)
        xys = mvdet_decode(score, woff, reduce=4)
        top_scores, top_idx = jax.lax.top_k(xys[:, :, 2], k)
        top_xy = jnp.take_along_axis(xys[:, :, :2], top_idx[..., None], axis=1)
        keep = jax.vmap(lambda p, s: distance_nms(p, s, 20.0))(top_xy, top_scores)
        return top_xy, keep

    for peaks in (False, True):
        for k in (512, 128):
            t = timeit(jax.jit(lambda a, b, k=k, pk=peaks: tail(a, b, k, pk)), whm, woff)
            print(f"decode+topk+nms k={k:4d} peaks={int(peaks)}: {t:7.1f} ms")


if __name__ == "__main__":
    main()
