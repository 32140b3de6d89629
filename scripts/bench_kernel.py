"""Microbenchmark: windowed-MSDA Pallas kernel fwd/bwd at flagship scale.

Times the attention op alone (one encoder layer's call) so kernel edits can
be evaluated without recompiling the full train step. Shapes mirror the
flagship: B x L=7 cams, 60x180 query grid (BEV 120x360 ds=2), M=8 heads,
D=16, P=4 points.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--radius", type=int, default=4)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--fwd_only", action="store_true",
                   help="skip the backward (the bwd kernel keeps the static "
                        "x-unroll and walls the Mosaic compiler at radius >= 12; "
                        "the large-radius grid-axis variant is forward/eval-only)")
    args = p.parse_args()

    from mvdetr_tpu.ops.msda_windowed import _pallas_windowed

    b, l, h, w, m, d, pnum = args.batch, 7, 60, 180, 8, 16, 4
    c = l
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((b, l, h, w, m, d)), jnp.bfloat16)
    off = jnp.asarray(rng.uniform(-4, 4, (b, c, h, w, m, l, pnum, 2)), jnp.float32)
    wgt = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((b, c, h, w, m, l * pnum)), jnp.float32), axis=-1
    ).reshape(b, c, h, w, m, l, pnum)

    fwd = jax.jit(lambda v, o, wg: _pallas_windowed(args.radius, False, True, v, o, wg))

    def loss(v, o, wg):
        return jnp.sum(_pallas_windowed(args.radius, False, True, v, o, wg).astype(jnp.float32) ** 2)

    bwd = jax.jit(lambda v, o, wg: jax.grad(loss, argnums=(0, 1, 2))(v, o, wg))

    def sync(r):
        leaf = jax.tree.leaves(r)[0]
        float(jnp.sum(leaf))

    cases = [("fwd", fwd)] if args.fwd_only else [("fwd", fwd), ("fwd+bwd", bwd)]
    for name, f in cases:
        t0 = time.time()
        sync(f(value, off, wgt))
        print(f"  [{name} compiled in {time.time() - t0:.0f}s]", flush=True)
        sync(f(value, off, wgt))
        t0 = time.time()
        for _ in range(args.iters):
            r = f(value, off, wgt)
        sync(r)
        ms = (time.time() - t0) / args.iters * 1000
        print(f"{name}: {ms:.2f} ms (batch {args.batch}, radius {args.radius})", flush=True)


if __name__ == "__main__":
    main()
