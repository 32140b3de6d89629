"""Component breakdown of the flagship train step on the attached TPU.

Times each stage of the forward/backward separately (value-fetch barriers)
so BENCH notes can report where the milliseconds go, plus an MFU estimate.
Usage: python scripts/profile_step.py [--batch 1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvdetr_tpu.utils.cache import enable_compilation_cache, use_fast_prng

enable_compilation_cache()
use_fast_prng()

import jax
import jax.numpy as jnp
import numpy as np


def _sync(r):
    leaf = jax.tree.leaves(r)[0]
    float(jnp.sum(leaf[..., :1] if getattr(leaf, "ndim", 0) else leaf))


def timeit(f, *a, iters=10):
    _sync(f(*a))
    t0 = time.time()
    for _ in range(iters):
        r = f(*a)
    _sync(r)
    return (time.time() - t0) / iters * 1000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--trace_dir", type=str, default=None, help="dump a jax.profiler trace here")
    args = p.parse_args()

    from mvdetr_tpu.data import FrameDataset, SyntheticScene
    from mvdetr_tpu.geometry import make_synthetic_rig
    from mvdetr_tpu.models import MVDeTr
    from mvdetr_tpu.train import create_train_state, train_step
    from mvdetr_tpu.train.trainer import supervised_loss

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
    rng = jax.random.PRNGKey(0)

    # ---- full step
    step = jax.jit(lambda s, b, r: train_step.__wrapped__(s, b, r))
    t_step = timeit(step, state, batch, rng)

    # ---- forward only (train mode, with loss)
    def fwd_loss(params, stats, b, r):
        out, _ = state.apply_fn({"params": params, "batch_stats": stats}, b["imgs"], b["affine_mats"],
                                train=True, mutable=["batch_stats"], rngs={"dropout": r})
        return supervised_loss(out, b)[0]

    f_fwd = jax.jit(fwd_loss)
    t_fwd = timeit(f_fwd, state.params, state.batch_stats, batch, rng)

    # ---- forward+backward without the optimizer
    f_grad = jax.jit(lambda p, s, b, r: jax.grad(fwd_loss)(p, s, b, r))
    t_grad = timeit(f_grad, state.params, state.batch_stats, batch, rng)

    # ---- backbone alone
    imgs = batch["imgs"]
    b, n, h, w, _ = imgs.shape
    x = imgs.reshape(b * n, h, w, 3)
    base_params = {"params": state.params["base"], "batch_stats": state.batch_stats["base"]}
    from mvdetr_tpu.models import ResNetFeatures

    backbone = ResNetFeatures(dtype=jnp.bfloat16)
    f_bb = jax.jit(lambda v, xx: backbone.apply(v, xx, train=False))
    t_bb = timeit(f_bb, base_params, x)

    def bb_loss(v, xx):
        return jnp.sum(backbone.apply(v, xx, train=False).astype(jnp.float32) ** 2)

    f_bbg = jax.jit(lambda v, xx: jax.grad(bb_loss)(v, xx))
    t_bbg = timeit(f_bbg, base_params, x)

    # ---- inference (serving path): eval_step = fwd + dense decode + top-K NMS
    from mvdetr_tpu.train.trainer import eval_step

    f_eval = jax.jit(lambda s, b: eval_step.__wrapped__(s, b, world_reduce=4, num_candidates=512))
    t_eval = timeit(f_eval, state, batch)

    # ---- FLOP estimate for MFU (cost analysis of the jitted step)
    try:
        comp = step.lower(state, batch, rng).compile()
        flops = comp.cost_analysis().get("flops", float("nan"))
    except Exception:
        flops = float("nan")

    fps = args.batch / (t_step / 1000)
    # v5e peak: 197 TFLOP/s bf16, 98.5 TFLOP/s f32 — use bf16 as the compute dtype
    mfu = flops / (t_step / 1000) / 197e12 * 100 if flops == flops else float("nan")
    print(f"batch={args.batch}")
    print(f"full train step : {t_step:8.1f} ms   ({fps:.2f} frame-sets/s/chip)")
    print(f"fwd (loss)      : {t_fwd:8.1f} ms")
    print(f"fwd+bwd (grad)  : {t_grad:8.1f} ms   (optimizer ~ {t_step - t_grad:.1f} ms)")
    print(f"backbone fwd    : {t_bb:8.1f} ms")
    print(f"backbone fwd+bwd: {t_bbg:8.1f} ms")
    print(f"eval step (infer): {t_eval:7.1f} ms   ({args.batch / (t_eval / 1000):.2f} frame-sets/s/chip inference)")
    print(f"step flops      : {flops:.3e}   MFU ~ {mfu:.1f}% of v5e bf16 peak")

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            for _ in range(3):
                state, aux = train_step(state, batch, rng)
            float(aux["loss"])
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
