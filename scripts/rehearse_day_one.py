"""Full-scale day-one rehearsal: reference checkpoint -> MODA on TPU.

Builds the COMPLETE day-one artifact set at true Wildtrack scale and runs the
exact command a user will run the day real data exists:

1. a Wildtrack-format on-disk tree (7 cams, 1080x1920 JPEGs, calibration
   XMLs, annotations) generated from a synthetic scene (tests/_fixture_trees),
2. a reference-format ``MultiviewDetector.pth`` at full flagship config
   (randomized torch MVDeTr built from the ACTUAL reference implementation,
   120x360 BEV, deform_trans),
3. ``cli.py -d wildtrack --data_root <tree> --load_torch_ckpt <pth>`` with
   the radius-8 windowed fast path — conversion, kornia warp convention,
   eval, CLEAR, clip-fraction telemetry, wall-clock.

A randomized checkpoint yields garbage MODA by construction — the point is
that every step of the real pipeline (adapter -> converter -> TPU eval)
executes at real scale and reports honest timings.

Usage: python scripts/rehearse_day_one.py [--frames 8] [--workdir /tmp/day1]
"""

import argparse
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mvdetr_tpu.utils.cache import enable_compilation_cache, use_fast_prng

enable_compilation_cache()
use_fast_prng()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--workdir", default="/tmp/day_one_rehearsal")
    p.add_argument("--attn_mode", default="windowed")
    p.add_argument("--attn_radius", type=int, default=8)
    args = p.parse_args()

    from tests._fixture_trees import wildtrack_like_scene, write_wildtrack_tree
    from tests._reference_torch import RefDatasetShim, import_reference_mvdetr

    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir)
    root = os.path.join(args.workdir, "Wildtrack")

    t0 = time.time()
    scene = wildtrack_like_scene(num_frame=args.frames, num_person=16)
    write_wildtrack_tree(root, scene)
    n_imgs = args.frames * 7
    print(f"[1/3] wrote Wildtrack-format tree ({n_imgs} 1080x1920 JPEGs) in {time.time()-t0:.0f}s")

    t0 = time.time()
    import torch

    ref_mvdetr = import_reference_mvdetr()
    dataset = RefDatasetShim(scene.rig, world_reduce=4, img_reduce=12)
    torch.manual_seed(41)
    tmodel = ref_mvdetr.MVDeTr(dataset, arch="resnet18", world_feat_arch="deform_trans",
                               bottleneck_dim=128, outfeat_dim=0, droupout=0.0)
    ckpt = os.path.join(args.workdir, "MultiviewDetector.pth")
    torch.save(tmodel.state_dict(), ckpt)
    size_mb = os.path.getsize(ckpt) / 2**20
    print(f"[2/3] built + saved full-scale reference checkpoint ({size_mb:.0f} MB) in {time.time()-t0:.0f}s")

    t0 = time.time()
    os.chdir(args.workdir)
    from mvdetr_tpu.cli import main as cli_main

    cli_main([
        "-d", "wildtrack",
        "--data_root", root,
        "--load_torch_ckpt", ckpt,
        "--attn_mode", args.attn_mode,
        "--attn_radius", str(args.attn_radius),
        "--epochs", "1",
        "--num_workers", "4",
        "--cls_thres", "0.3",
        "--batch_size", "1",
    ])
    print(f"[3/3] day-one eval command completed in {time.time()-t0:.0f}s "
          f"(attn {args.attn_mode} r{args.attn_radius}; incl. compile)")


if __name__ == "__main__":
    main()
