"""Whole-train-step xprof breakdown (the BENCH_NOTES hlo_stats table).

Captures a perfetto trace of 3 steady-state flagship train steps, then
aggregates device-track op durations into the report groups used in
BENCH_NOTES (attention fwd/bwd kernels, convs, warp, loop fusions, data
formatting, misc).

Usage: python scripts/trace_step.py [--batch 2] [--top 40]
       python scripts/trace_step.py --parse <trace.json.gz>
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


def classify(name: str) -> str:
    n = name.lower()
    if "bwd_kernel" in n or ("custom-call" in n and "bwd" in n):
        return "attention bwd pallas"
    if "_kernel" in n and ("msda" in n or "pallas" in n):
        return "attention fwd pallas"
    if "warp_bwd" in n:
        return "warp bwd pallas"
    if "convolution" in n or "conv" in n and "fusion" in n:
        return "convolution"
    if "transpose" in n or "copy" in n or "reshape" in n or "pad" in n or "concatenate" in n:
        return "data formatting"
    if "gather" in n:
        return "gather (warp fwd)"
    if "scatter" in n or "select-and-scatter" in n:
        return "scatter/maxpool-bwd"
    if "fusion" in n or "loop" in n:
        return "loop fusions (eltwise)"
    if "dot" in n:
        return "matmul"
    if "all-reduce" in n or "all-gather" in n:
        return "collectives"
    return "misc"


def parse(path, steps=3, top=40):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    # device pids from the process_name metadata (host python tracks would
    # otherwise swamp the table with tracing/compile frames)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n or "Accelerator" in n or "XLA" in n}
    durs, counts = defaultdict(float), defaultdict(int)
    groups = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            if device_pids and e.get("pid") not in device_pids:
                continue
            name = e.get("name", "?")
            if name.startswith(("pthread", "Thread", "profiler", "$", "PjitFunction")):
                continue
            durs[name] += e["dur"]
            counts[name] += 1
    total = sum(durs.values())
    print(f"== per-op (top {top}), {steps} steps, all-track sum {total / 1000:.1f} ms ==")
    for name, us in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        groups[classify(name)] += us
        print(f"{us / steps / 1000:9.2f} ms/step {counts[name]:5d}x  {name[:110]}")
    for name, us in sorted(durs.items(), key=lambda kv: -kv[1])[top:]:
        groups[classify(name)] += us
    print("\n== groups (ms/step) ==")
    for g, us in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"{us / steps / 1000:9.2f}  {g}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--parse", default=None)
    p.add_argument("--out", default="/tmp/steptrace_pf")
    args = p.parse_args()
    if args.parse:
        parse(args.parse, top=args.top)
        return

    from mvdetr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from mvdetr_tpu.data import FrameDataset, SyntheticScene
    from mvdetr_tpu.geometry import make_synthetic_rig
    from mvdetr_tpu.models import MVDeTr
    from mvdetr_tpu.train import create_train_state, train_step

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

    state, aux = train_step(state, batch, rng)
    float(aux["loss"])  # compile barrier
    with jax.profiler.trace(args.out, create_perfetto_trace=True):
        for _ in range(3):
            state, aux = train_step(state, batch, rng)
        float(aux["loss"])
    time.sleep(1)
    hits = sorted(glob.glob(os.path.join(args.out, "**", "*.json.gz"), recursive=True))
    if not hits:
        print("no perfetto trace found under", args.out)
        return
    print("trace:", hits[-1])
    parse(hits[-1], top=args.top)


if __name__ == "__main__":
    main()
