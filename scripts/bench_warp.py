"""Microbenchmark: BEV perspective-warp fwd/bwd at flagship scale.

Shapes mirror the flagship hot call (`models/mvdetr.py:140`): B*N=7 views,
90x160 feature maps (720x1280 / stride 8), 128 channels, warped to the
120x360 reduced BEV grid with per-view homographies from the synthetic
Wildtrack-scale rig.
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
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    from mvdetr_tpu.geometry import make_synthetic_rig
    from mvdetr_tpu.ops.warp import perspective_warp

    rig = make_synthetic_rig(
        num_cam=7, img_shape=(1080, 1920), worldgrid_shape=(480, 1440),
        cell_meters=0.025, indexing="ij", worldcoord_unit=0.01, origin_offset=(-300.0, -900.0),
        camera_height_m=6.0, camera_margin_m=4.0, name="BenchWildtrack",
    )
    proj = rig.proj_mats(world_reduce=4).astype(np.float32)  # [N, 3, 3] img px -> BEV
    reduce_mat = np.diag([12.0, 12.0, 1.0]).astype(np.float32)
    mats = np.einsum("nij,jk->nik", proj, reduce_mat)  # feature px -> BEV
    bn = args.batch * 7
    mats = jnp.asarray(np.tile(mats, (args.batch, 1, 1)))

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((bn, 90, 160, 128)), jnp.bfloat16)
    out_shape = (120, 360)

    fwd = jax.jit(lambda f: perspective_warp(f, mats, out_shape))

    def loss(f):
        return jnp.sum(perspective_warp(f, mats, out_shape).astype(jnp.float32) ** 2)

    bwd = jax.jit(jax.grad(loss))

    def sync(r):
        leaf = jax.tree.leaves(r)[0]
        float(jnp.sum(leaf[..., 0]))

    for name, f in [("fwd", fwd), ("fwd+bwd", bwd)]:
        t0 = time.time()
        sync(f(feats))
        print(f"  [{name} compiled in {time.time() - t0:.0f}s]", flush=True)
        sync(f(feats))
        t0 = time.time()
        for _ in range(args.iters):
            r = f(feats)
        sync(r)
        ms = (time.time() - t0) / args.iters * 1000
        print(f"{name}: {ms:.2f} ms (batch {args.batch}, {bn} views)", flush=True)


if __name__ == "__main__":
    main()
