"""Perfetto trace of the windowed-MSDA op (fwd+bwd) and the warp bwd — dumps
per-op device durations so kernel-vs-epilogue cost is measurable, not guessed.

Usage: python scripts/trace_kernel.py [--what attn|warp] [--out /tmp/trace]
Then parse with: python scripts/trace_kernel.py --parse <trace.json.gz>
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvdetr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def run_attn(out_dir):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvdetr_tpu.ops.msda_windowed import _pallas_windowed

    b, l, h, w, m, d, pnum = 1, 7, 60, 180, 8, 16, 4
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((b, l, h, w, m, d)), jnp.bfloat16)
    off = jnp.asarray(rng.uniform(-4, 4, (b, l, h, w, m, l, pnum, 2)), jnp.float32)
    wgt = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((b, l, h, w, m, l * pnum)), jnp.float32), axis=-1
    ).reshape(b, l, h, w, m, l, pnum)

    def loss(v, o, wg):
        return jnp.sum(_pallas_windowed(4, False, True, v, o, wg).astype(jnp.float32) ** 2)

    bwd = jax.jit(lambda v, o, wg: jax.grad(loss, argnums=(0, 1, 2))(v, o, wg))
    r = bwd(value, off, wgt)
    float(jax.tree.leaves(r)[0].sum())
    with jax.profiler.trace(out_dir, create_perfetto_trace=True):
        for _ in range(3):
            r = bwd(value, off, wgt)
        float(jax.tree.leaves(r)[0].sum())


def run_warp(out_dir):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvdetr_tpu.geometry import make_synthetic_rig
    from mvdetr_tpu.ops.warp import perspective_warp

    rig = make_synthetic_rig(
        num_cam=7, img_shape=(1080, 1920), worldgrid_shape=(480, 1440),
        cell_meters=0.025, indexing="ij", worldcoord_unit=0.01, origin_offset=(-300.0, -900.0),
        camera_height_m=6.0, camera_margin_m=4.0, name="BenchWildtrack",
    )
    proj = rig.proj_mats(world_reduce=4).astype(np.float32)
    mats = jnp.asarray(np.einsum("nij,jk->nik", proj, np.diag([12.0, 12.0, 1.0]).astype(np.float32)))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((7, 90, 160, 128)), jnp.bfloat16)

    def loss(f):
        return jnp.sum(perspective_warp(f, mats, (120, 360)).astype(jnp.float32) ** 2)

    bwd = jax.jit(jax.grad(loss))
    r = bwd(feats)
    float(r.sum())
    with jax.profiler.trace(out_dir, create_perfetto_trace=True):
        for _ in range(3):
            r = bwd(feats)
        float(r.sum())


def parse(path):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    durs = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            durs[name] += e["dur"]
            counts[name] += 1
    total = sum(durs.values())
    print(f"{'us_total':>12} {'n':>5}  name   (sum {total/1000:.1f} ms over all tracks)")
    for name, us in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{us:12.0f} {counts[name]:5d}  {name[:140]}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="attn", choices=["attn", "warp"])
    p.add_argument("--out", default="/tmp/ktrace")
    p.add_argument("--parse", default=None)
    args = p.parse_args()
    if args.parse:
        parse(args.parse)
    else:
        out = os.path.join(args.out, args.what)
        (run_attn if args.what == "attn" else run_warp)(out)
        time.sleep(1)
        hits = glob.glob(os.path.join(out, "**", "*.json.gz"), recursive=True)
        print("TRACE " + (hits[-1] if hits else "NOT FOUND"))
