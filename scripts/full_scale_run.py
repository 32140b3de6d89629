"""Full-Wildtrack-scale training demonstration on TPU (VERDICT r4 Missing #1).

Everything at TRUE Wildtrack scale, end-to-end through the real day-one
command path (`/root/reference/main.py:130-142` is the epoch loop the
2080TI numbers come from):

1. Generate a Wildtrack-format on-disk dataset tree — 7 cams, 1080x1920
   JPEGs, 480x1440 ij grid (cm units, offset origin), 2000 frames, 30-person
   crowd — from a synthetic scene (no real/licensed assets exist in this
   environment; the tree follows the exact format contracts of
   `datasets/Wildtrack.py:36-118` and is read back by the real adapters).
2. Run ``python -m mvdetr_tpu.cli -d wildtrack --data_root <tree>`` for the
   full schedule (10 epochs, OneCycle — `main.py:162,165-166`), training on
   the 90% split and running decode->NMS->CLEAR on the 10% hold-out each
   epoch, exactly as a user would.
3. Report: final/best MODA, wall-clock per epoch (train and eval
   separately), host input-pipeline throughput vs chip demand, and peak HBM.

The measured epoch wall-clock is THE number that faces BASELINE.md's
"beat the 2080TI wall-clock/epoch" target: same frame count as Wildtrack's
train split (1800), same image/grid resolution, same per-epoch protocol.

Usage:
    python scripts/full_scale_run.py                   # full 2000-frame run
    python scripts/full_scale_run.py --frames 200 --epochs 2   # smoke
Generation is resumable: an existing complete tree is reused.
"""

import argparse
import json
import multiprocessing as mp
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_scene(frames: int, persons: int, seed: int):
    from tests._fixture_trees import wildtrack_like_scene

    return wildtrack_like_scene(num_frame=frames, num_person=persons, seed=seed,
                                cache_images=False)


def _render_chunk(job):
    """Worker: render + JPEG-encode frames [lo, hi) for all 7 cameras."""
    root, frames, persons, seed, lo, hi = job
    import cv2

    scene = make_scene(frames, persons, seed)
    for f in range(lo, hi):
        for cam in range(scene.rig.num_cam):
            path = os.path.join(root, "Image_subsets", f"C{cam + 1}", f"{f:08d}.jpg")
            if os.path.exists(path):
                continue
            img = scene.image(cam, f)
            cv2.imwrite(path, img[:, :, ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), 85])
    return hi - lo


def generate_tree(root: str, frames: int, persons: int, seed: int, procs: int) -> float:
    """Write the Wildtrack-format tree; returns generation seconds."""
    from tests._fixture_trees import write_wildtrack_tree

    t0 = time.time()
    scene = make_scene(frames, persons, seed)
    marker = os.path.join(root, ".complete")
    if os.path.exists(marker) and open(marker).read().strip() == f"{frames}x{persons}s{seed}":
        print(f"[gen] reusing existing tree at {root}")
        return 0.0
    # calibrations + annotations (cheap) in-process; images in parallel
    write_wildtrack_tree(root, scene, with_images=False)
    for cam in range(7):
        os.makedirs(os.path.join(root, "Image_subsets", f"C{cam + 1}"), exist_ok=True)
    chunk = max(1, frames // (procs * 4))
    jobs = [(root, frames, persons, seed, lo, min(lo + chunk, frames))
            for lo in range(0, frames, chunk)]
    done = 0
    with mp.get_context("spawn").Pool(procs) as pool:
        for n in pool.imap_unordered(_render_chunk, jobs):
            done += n
            print(f"[gen] {done}/{frames} frames rendered ({time.time() - t0:.0f}s)", flush=True)
    with open(marker, "w") as fh:
        fh.write(f"{frames}x{persons}s{seed}")
    return time.time() - t0


def measure_pipeline(root: str, batch_size: int, num_workers: int, n_batches: int = 12,
                     **dataset_kw) -> float:
    """Host input-pipeline throughput (frame-sets/s): disk JPEG decode +
    random affine + resize + target build, no TPU in the loop."""
    from mvdetr_tpu.data import FrameDataset, open_scene

    scene = open_scene(root)
    ds = FrameDataset(scene, train=True, augmentation=True, **dataset_kw)

    def stream():
        while True:
            yield from ds.batches(batch_size, num_workers=num_workers)

    it = stream()
    next(it)  # warm (thread pool spin-up, first-touch IO)
    t0 = time.time()
    n = 0
    for _ in range(n_batches):
        next(it)
        n += batch_size
    return n / (time.time() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=2000)
    p.add_argument("--persons", type=int, default=30)
    p.add_argument("--scene_seed", type=int, default=5)
    p.add_argument("--workdir", default="/root/full_scale")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--lr", type=float, default=8e-4)
    p.add_argument("--base_lr_ratio", type=float, default=1.0)
    p.add_argument("--cls_thres", type=float, default=0.4)
    p.add_argument("--world_kernel_size", type=int, default=10)
    p.add_argument("--img_kernel_size", type=int, default=10)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--gen_procs", type=int, default=2)
    # bf16 is the TPU-native training dtype (bench.py's mode). The reference
    # creates a GradScaler but its autocast is commented out (`main.py:105`,
    # `trainer.py:49`), i.e. it trains f32 — but flagship-scale f32 EVAL at
    # batch 2 sits at the HBM cliff of the attached worker (round-5 probe
    # matrix), so the demonstration runs the bf16 mode end to end.
    p.add_argument("--bf16", default="true")
    p.add_argument("--epochs_per_process", type=int, default=1)
    p.add_argument("--skip_train", action="store_true")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    root = os.path.join(args.workdir, "Wildtrack")
    gen_s = generate_tree(root, args.frames, args.persons, args.scene_seed, args.gen_procs)
    n_imgs = args.frames * 7
    print(f"[1/3] Wildtrack-format tree ready: {n_imgs} 1080x1920 JPEGs, "
          f"480x1440 grid, {args.persons} persons ({gen_s:.0f}s)")
    if args.skip_train:
        return

    from mvdetr_tpu.utils.cache import enable_compilation_cache, use_fast_prng

    enable_compilation_cache()
    use_fast_prng()

    pipe_fs = measure_pipeline(
        root, args.batch_size, args.num_workers,
        world_kernel_size=args.world_kernel_size, img_kernel_size=args.img_kernel_size,
    )
    print(f"[2/3] host input pipeline: {pipe_fs:.2f} frame-sets/s "
          f"({args.num_workers} workers, batch {args.batch_size})")

    t0 = time.time()
    rundir = os.path.join(args.workdir, "run")
    import shutil
    import subprocess

    shutil.rmtree(rundir, ignore_errors=True)
    base = [
        sys.executable, "-m", "mvdetr_tpu.cli",
        "-d", "wildtrack",
        "--data_root", root,
        "--epochs", str(args.epochs),
        "-b", str(args.batch_size),
        "--lr", str(args.lr),
        "--base_lr_ratio", str(args.base_lr_ratio),
        "--cls_thres", str(args.cls_thres),
        "--world_kernel_size", str(args.world_kernel_size),
        "--img_kernel_size", str(args.img_kernel_size),
        "--num_workers", str(args.num_workers),
        "--bf16", str(args.bf16),
        "--epochs_per_process", str(args.epochs_per_process),
    ]
    # prepend (not replace!) the repo on PYTHONPATH — the axon plugin rides
    # the existing PYTHONPATH (~/.axon_site) and must stay visible
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    # One process per epoch: the axon tunnel client pins a host-side copy of
    # every H2D transfer (~39 MB per image batch, measured; no JAX-level
    # release works — BENCH_NOTES round 5), so a 9000-step run would exhaust
    # host RAM. Each epoch stays under ~45 GB and exits; the next process
    # restores the FULL train state (optimizer + schedule step) via
    # --resume_train. Compile comes from the persistent cache.
    for launch in range(0, args.epochs, args.epochs_per_process):
        cmd = base + (["--logdir", rundir] if launch == 0 else ["--resume_train", rundir])
        rc = subprocess.run(cmd, cwd=args.workdir, env=env).returncode
        if rc != 0:
            raise SystemExit(f"cli epoch process (launch {launch}) failed rc={rc}")
    total_s = time.time() - t0
    peak_gb = 0.0  # axon reports no device memory stats

    # scrape per-epoch wall-clock + MODA from the run log
    log = open(os.path.join(args.workdir, "run", "log.txt")).read()
    train_ts = [float(m) for m in re.findall(r"Train epoch \d+ done: .*t ([\d.]+)s", log)]
    tests = re.findall(r"Test: loss [\d.]+, moda ([-\d.]+)%.*t ([\d.]+)s", log)
    modas = [float(m) for m, _ in tests]
    eval_ts = [float(t) for _, t in tests]
    steady_train = sorted(train_ts[1:] or train_ts)[len(train_ts[1:] or train_ts) // 2]
    report = {
        "frames": args.frames,
        "train_frames": int(args.frames * 0.9),
        "epochs": args.epochs,
        "gen_seconds": round(gen_s, 1),
        "pipeline_fs_per_s": round(pipe_fs, 2),
        "epoch_train_seconds": [round(t, 1) for t in train_ts],
        "epoch_train_seconds_steady": round(steady_train, 1),
        "train_fs_per_s_steady": round(args.frames * 0.9 / steady_train, 2),
        "epoch_eval_seconds": [round(t, 1) for t in eval_ts],
        "moda_per_epoch": modas,
        "final_moda": modas[-1] if modas else None,
        "best_moda": max(modas) if modas else None,
        "peak_hbm_gb": round(peak_gb, 2),
        "total_seconds": round(total_s, 1),
    }
    print("[3/3] FULL-SCALE REPORT")
    print(json.dumps(report, indent=2))
    with open(os.path.join(args.workdir, "report.json"), "w") as fh:
        json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
