"""Experiment driver CLI — the `main.py` equivalent.

Flag surface and behaviors from `/root/reference/main.py:150-186`:
config-encoded logdir names (`main.py:77-82`), stdout tee to ``log.txt``,
per-epoch checkpoint + test, ``--resume`` (weights-only reload, then test),
seeded determinism. New over the reference: ``--dataset synthetic`` (no assets
needed), mesh flags (``--view_shards``) for multi-chip runs, full-train-state
checkpointing.

Usage::

    python -m mvdetr_tpu.cli -d wildtrack --epochs 10
    python -m mvdetr_tpu.cli -d synthetic --epochs 3 --world_feat conv --use_mse true
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="TPU-native multiview detector")
    parser.add_argument("--reID", action="store_true")
    parser.add_argument("--semi_supervised", type=float, default=0)
    parser.add_argument("--id_ratio", type=float, default=0)
    parser.add_argument("--cls_thres", type=float, default=0.6)
    parser.add_argument("--alpha", type=float, default=1.0, help="ratio for per view loss")
    parser.add_argument("--use_mse", type=str2bool, default=False)
    parser.add_argument("--arch", type=str, default="resnet18", choices=["vgg11", "resnet18"])
    parser.add_argument("-d", "--dataset", type=str, default="wildtrack",
                        choices=["wildtrack", "multiviewx", "synthetic"])
    parser.add_argument("-j", "--num_workers", type=int, default=4)
    parser.add_argument("-b", "--batch_size", type=int, default=1)
    parser.add_argument("--dropout", type=float, default=0.0)
    parser.add_argument("--dropcam", type=float, default=0.0)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--base_lr_ratio", type=float, default=0.1)
    parser.add_argument("--weight_decay", type=float, default=1e-4)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--resume_train", type=str, default=None,
                        help="logdir (path or logs/<dataset>/<name>) to restore the FULL "
                             "train state (params, optimizer, schedule step) from and "
                             "continue the epoch loop — beyond the reference's weights-only "
                             "--resume (`main.py:143-147`)")
    parser.add_argument("--epochs_per_process", type=int, default=None,
                        help="stop after N epochs this process (checkpoint saved); rerun "
                             "with --resume_train to continue. Works around the axon "
                             "tunnel's per-H2D-transfer host-memory pinning on long "
                             "image-heavy runs (BENCH_NOTES round 5)")
    parser.add_argument("--visualize", action="store_true")
    parser.add_argument("--profile", action="store_true",
                        help="dump a jax.profiler device trace of epoch-1 steps 2-4 to logdir/trace")
    parser.add_argument("--seed", type=int, default=2021)
    parser.add_argument("--deterministic", type=str2bool, default=False)
    parser.add_argument("--augmentation", type=str2bool, default=True)
    parser.add_argument("--world_feat", type=str, default="deform_trans",
                        choices=["conv", "trans", "deform_conv", "deform_trans", "aio"])
    parser.add_argument("--bottleneck_dim", type=int, default=128)
    parser.add_argument("--outfeat_dim", type=int, default=0)
    parser.add_argument("--world_reduce", type=int, default=4)
    parser.add_argument("--world_kernel_size", type=int, default=10)
    parser.add_argument("--img_reduce", type=int, default=12)
    parser.add_argument("--img_kernel_size", type=int, default=10)
    # TPU-native additions
    parser.add_argument("--view_shards", type=int, default=1, help="devices along the view mesh axis")
    parser.add_argument("--bev_shards", type=int, default=1,
                        help="devices along the BEV-row mesh axis (halo-exchange attention; "
                             "windowed deform_trans only)")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="multi-host: JAX coordinator host:port")
    parser.add_argument("--num_processes", type=int, default=None, help="multi-host: process count")
    parser.add_argument("--process_id", type=int, default=None, help="multi-host: this process index")
    parser.add_argument("--bf16", type=str2bool, default=False, help="bfloat16 compute (params stay f32)")
    parser.add_argument("--attn_mode", type=str, default="auto",
                        choices=["auto", "gather", "windowed", "warped"])
    parser.add_argument("--n_points", type=int, default=4, choices=[4, 8],
                        help="deformable points per (head, level); 8 = shadow reference maps")
    parser.add_argument("--attn_radius", type=int, default=None,
                        help="windowed-attention clamp radius in BEV cells (default 4; "
                             "with --load_torch_ckpt it is auto-picked from the "
                             "checkpoint's sampling_offsets biases — interop.suggest_attn_radius)")
    parser.add_argument("--nms_top_k", type=int, default=512,
                        help="eval candidate cap before NMS (the trainer warns when it saturates)")
    parser.add_argument("--remat_backbone", type=str2bool, default=False,
                        help="rematerialize backbone blocks on backward (HBM for FLOPs; "
                             "enables larger per-chip batches)")
    parser.add_argument("--backbone_ckpt", type=str, default=None,
                        help="torchvision resnet18 .pth/.npz for ImageNet init")
    parser.add_argument("--load_torch_ckpt", type=str, default=None,
                        help="reference MultiviewDetector.pth (full model) — convert via "
                             "mvdetr_tpu.interop and run eval only (`main.py:142-147` interop)")
    parser.add_argument("--warp_convention", type=str, default=None,
                        choices=["center", "kornia"],
                        help="BEV warp sampling convention; default 'center' "
                             "('kornia' when --load_torch_ckpt is set, for reference parity)")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--logdir", type=str, default=None,
                        help="explicit run directory (overrides the config-encoded name; "
                             "multihost runs derive a deterministic shared name by default)")
    # synthetic-scene sizing (dataset == synthetic only)
    parser.add_argument("--synthetic_cams", type=int, default=4)
    parser.add_argument("--synthetic_frames", type=int, default=60)
    parser.add_argument("--synthetic_img", type=int, nargs=2, default=(180, 320))
    parser.add_argument("--synthetic_grid", type=int, nargs=2, default=(120, 240))
    return parser


def main(args=None):
    from mvdetr_tpu.utils.cache import enable_compilation_cache, use_fast_prng

    enable_compilation_cache()
    use_fast_prng()

    import jax
    import numpy as np

    from mvdetr_tpu.data import FrameDataset, SyntheticScene, open_scene
    from mvdetr_tpu.geometry import make_synthetic_rig
    from mvdetr_tpu.models import MVDeTr, load_torchvision_state_dict
    from mvdetr_tpu.train import (
        Trainer, create_train_state, restore_weights, save_checkpoint,
    )
    from mvdetr_tpu.utils.logger import Logger

    args = build_parser().parse_args(args)

    if args.num_processes and args.num_processes > 1:
        from mvdetr_tpu.parallel import initialize_distributed

        initialize_distributed(args.coordinator_address, args.num_processes, args.process_id)

    if args.dataset == "synthetic":
        rig = make_synthetic_rig(
            num_cam=args.synthetic_cams,
            img_shape=tuple(args.synthetic_img),
            worldgrid_shape=tuple(args.synthetic_grid),
        )
        scene = SyntheticScene(rig, num_frame=args.synthetic_frames, num_person=8, seed=args.seed)
    else:
        scene = open_scene(args.data_root or args.dataset)
        rig = scene.rig

    common = dict(
        world_reduce=args.world_reduce, img_reduce=args.img_reduce,
        world_kernel_size=args.world_kernel_size, img_kernel_size=args.img_kernel_size,
        seed=args.seed,
    )
    train_set = FrameDataset(scene, train=True, semi_supervised=args.semi_supervised,
                             dropout=args.dropcam, augmentation=args.augmentation, **common)
    test_set = FrameDataset(scene, train=False, **common)

    # logdir convention (`main.py:77-89`). Multihost: every process must
    # resolve the SAME directory (orbax checkpoint saves are collective over
    # a shared dir), so the per-process wall-clock timestamp is replaced by a
    # deterministic seed-based tag; the tee/snapshot run on process 0 only.
    multihost = bool(args.num_processes and args.num_processes > 1)
    if args.resume_train is not None:
        logdir = (args.resume_train if os.path.isdir(args.resume_train)
                  else f"logs/{args.dataset}/{args.resume_train}")
        if jax.process_index() == 0:
            sys.stdout = Logger(os.path.join(logdir, "log.txt"), append=True)
    elif args.resume is None:
        if args.logdir is not None:
            logdir = args.logdir
        else:
            stamp = (f"mh{args.num_processes}_seed{args.seed}" if multihost
                     else f"{datetime.datetime.today():%Y-%m-%d_%H-%M-%S}")
            logdir = (
                f"logs/{args.dataset}/{'SS_' if args.semi_supervised else ''}"
                f"{'aug_' if args.augmentation else ''}{args.world_feat}_lr{args.lr}_baseR{args.base_lr_ratio}_"
                f"neck{args.bottleneck_dim}_out{args.outfeat_dim}_"
                f"alpha{args.alpha}_id{args.id_ratio}_drop{args.dropout}_dropcam{args.dropcam}_"
                f"worldRK{args.world_reduce}_{args.world_kernel_size}_imgRK{args.img_reduce}_{args.img_kernel_size}_"
                f"{stamp}"
            )
        # the multihost stamp is deterministic (mh{n}_seed{seed}), so two runs
        # with identical config+seed resolve the same directory — their
        # checkpoints would interleave and log.txt would be overwritten
        if multihost and args.logdir is None and os.path.isdir(os.path.join(logdir, "checkpoints")):
            print(
                f"WARNING: multihost logdir {logdir} already contains checkpoints "
                f"from a previous run with the same config+seed; resuming picks the "
                f"latest step across BOTH runs. Pass --logdir for a fresh directory."
            )
        os.makedirs(logdir, exist_ok=True)
        if jax.process_index() == 0:
            _snapshot_source(logdir)
            sys.stdout = Logger(os.path.join(logdir, "log.txt"))
    else:
        logdir = f"logs/{args.dataset}/{args.resume}"
    print(logdir)
    print("Settings:")
    print(vars(args))

    import jax.numpy as jnp

    mesh = None
    n_dev = len(jax.devices())
    if args.view_shards > 1 or args.bev_shards > 1 or n_dev > 1:
        from mvdetr_tpu.parallel import make_mesh

        # data axis must divide the batch; view axis must divide the cameras
        per = args.view_shards * args.bev_shards
        data_size = max(1, min(n_dev // per, args.batch_size))
        while args.batch_size % data_size:
            data_size -= 1
        usable = data_size * per
        if usable > 1:
            mesh = make_mesh(num_view_shards=args.view_shards, num_bev_shards=args.bev_shards,
                             devices=jax.devices()[:usable])
            print(f"mesh: {dict(mesh.shape)}")

    # windowed clamp radius: explicit flag > checkpoint auto-pick > default 4.
    # For converted reference checkpoints (trained with unbounded offsets) a
    # host-side scan of the sampling_offsets biases picks the smallest radius
    # covering the learned static reach (VERDICT r4 #9; the data-dependent
    # remainder is reported by the eval offset_clip_fraction line).
    attn_radius = args.attn_radius
    if attn_radius is None and args.load_torch_ckpt and args.attn_mode != "gather":
        import torch

        from mvdetr_tpu.interop import suggest_attn_radius

        sd = torch.load(args.load_torch_ckpt, map_location="cpu")
        attn_radius, reach = suggest_attn_radius(sd)
        print(f"auto attn_radius {attn_radius} (checkpoint max |sampling_offsets bias| "
              f"{reach:.2f} cells; override with --attn_radius N, exact semantics with "
              f"--attn_mode gather)")
    if attn_radius is None:
        attn_radius = 4

    model = MVDeTr.from_rig(
        rig, world_reduce=args.world_reduce, img_reduce=args.img_reduce, arch=args.arch,
        world_feat_arch=args.world_feat, bottleneck_dim=args.bottleneck_dim,
        outfeat_dim=args.outfeat_dim, dropout=args.dropout,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        attn_mode=args.attn_mode, attn_radius=attn_radius, n_points=args.n_points,
        remat_backbone=args.remat_backbone,
        mesh=mesh,
        warp_convention=args.warp_convention
        or ("kornia" if args.load_torch_ckpt else "center"),
    )

    backbone_vars = None
    if args.backbone_ckpt:
        if args.arch == "vgg11":
            from mvdetr_tpu.models import load_torchvision_vgg11_state_dict as convert
        else:
            convert = load_torchvision_state_dict
        if args.backbone_ckpt.endswith(".npz"):
            backbone_vars = convert(dict(np.load(args.backbone_ckpt)))
        else:
            import torch

            backbone_vars = convert(torch.load(args.backbone_ckpt, map_location="cpu"))

    steps_per_epoch = train_set.steps_per_epoch(args.batch_size)
    sample = next(train_set.batches(args.batch_size))
    state = create_train_state(
        model, sample, lr=args.lr, total_steps=steps_per_epoch * args.epochs,
        base_lr_ratio=args.base_lr_ratio, weight_decay=args.weight_decay, seed=args.seed,
        backbone_variables=backbone_vars,
    )

    trainer = Trainer(state, train_set, test_set, cls_thres=args.cls_thres, alpha=args.alpha,
                      use_mse=args.use_mse, nms_top_k=args.nms_top_k, mesh=mesh,
                      num_workers=args.num_workers,
                      profile_dir=os.path.join(logdir, "trace") if args.profile else None)
    res_fpath = os.path.join(logdir, "test.txt")
    ckpt_dir = os.path.join(logdir, "checkpoints")
    vis_dir = os.path.join(logdir, "visualize") if args.visualize else None

    if args.deterministic:
        trainer.check_determinism(batch_size=args.batch_size)

    history = {"epoch": [], "train_loss": [], "test_loss": [], "moda": []}
    start_epoch = 1
    if args.resume_train:
        from mvdetr_tpu.train import restore_checkpoint

        trainer.state = restore_checkpoint(ckpt_dir, trainer.state)
        start_epoch = int(trainer.state.step) // steps_per_epoch + 1
        print(f"resume_train: restored step {int(trainer.state.step)} "
              f"-> continuing at epoch {start_epoch}/{args.epochs}")
    if args.load_torch_ckpt:
        from mvdetr_tpu.interop import load_torch_checkpoint
        from mvdetr_tpu.train import load_full_variables

        print(f"Loading reference torch checkpoint {args.load_torch_ckpt} (eval only)")
        if args.attn_mode not in ("gather",):
            print("NOTE: reference checkpoints train with unbounded offsets; "
                  "--attn_mode gather is reference-exact (slow). The fast paths clamp "
                  "offsets to --attn_radius — watch the offset_clip_fraction diagnostic.")
        variables, ckpt_cfg = load_torch_checkpoint(args.load_torch_ckpt, with_config=True)
        flag_cfg = {"arch": args.arch, "world_feat_arch": args.world_feat,
                    "bottleneck_dim": args.bottleneck_dim, "outfeat_dim": args.outfeat_dim,
                    "n_points": args.n_points}
        mismatched = {k: (flag_cfg[k], v) for k, v in ckpt_cfg.items()
                      if k in flag_cfg and flag_cfg[k] != v}
        if mismatched:
            flags = {"arch": "--arch", "world_feat_arch": "--world_feat",
                     "bottleneck_dim": "--bottleneck_dim", "outfeat_dim": "--outfeat_dim",
                     "n_points": "--n_points"}
            hint = " ".join(f"{flags[k]} {v}" for k, (_, v) in mismatched.items())
            raise SystemExit(
                f"checkpoint config mismatch {mismatched} (flag value, checkpoint value); "
                f"rerun with: {hint}"
            )
        trainer.state = load_full_variables(trainer.state, variables)
    elif args.resume is None:
        for epoch in range(start_epoch, args.epochs + 1):
            print(f"=== epoch {epoch}/{args.epochs} ===")
            train_loss = trainer.train_epoch(epoch, batch_size=args.batch_size)
            test_loss, moda, modp, prec, recall = trainer.test(batch_size=args.batch_size,
                                                               res_fpath=res_fpath,
                                                               visualize_dir=vis_dir)
            history["epoch"].append(epoch)
            history["train_loss"].append(train_loss)
            history["test_loss"].append(test_loss)
            history["moda"].append(moda)
            save_checkpoint(ckpt_dir, trainer.state)
            if jax.process_index() == 0:
                _draw_curve(os.path.join(logdir, "learning_curve.jpg"), history)
            if (args.epochs_per_process and epoch < args.epochs
                    and epoch - start_epoch + 1 >= args.epochs_per_process):
                print(f"epochs_per_process budget reached at epoch {epoch}; "
                      f"continue with --resume_train {logdir}")
                return trainer
    else:
        trainer.state = restore_weights(ckpt_dir, trainer.state)
        if args.profile:
            print("NOTE: --profile has no effect with --resume (the training loop is skipped)")
    print("Test loaded model...")
    trainer.test(batch_size=args.batch_size, res_fpath=res_fpath, visualize_dir=vis_dir)
    return trainer


def _snapshot_source(logdir: str) -> None:
    """Copy the package source into ``logdir/scripts`` so every run records
    the exact code it ran (`main.py:84-88`)."""
    import shutil

    src = os.path.dirname(os.path.abspath(__file__))
    dst = os.path.join(logdir, "scripts", "mvdetr_tpu")
    try:
        shutil.copytree(src, dst, ignore=shutil.ignore_patterns("__pycache__"), dirs_exist_ok=True)
    except OSError:
        pass  # snapshot is best-effort (read-only fs, etc.)


def _draw_curve(path: str, history: dict):
    """Per-epoch loss/MODA plot (`utils/draw_curve.py:7-18`); optional."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax1 = plt.subplots()
        ax1.plot(history["epoch"], history["train_loss"], "b-", label="train loss")
        ax1.plot(history["epoch"], history["test_loss"], "r-", label="test loss")
        ax1.legend(loc="upper left")
        ax2 = ax1.twinx()
        ax2.plot(history["epoch"], history["moda"], "g-", label="MODA %")
        ax2.legend(loc="upper right")
        fig.savefig(path)
        plt.close(fig)
    except Exception:
        pass


if __name__ == "__main__":
    main()
