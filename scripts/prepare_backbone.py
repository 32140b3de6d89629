"""Prepare the ImageNet resnet18 backbone asset for training.

The accuracy contract starts from torchvision's ImageNet weights
(`/root/reference/multiview_detector/models/resnet.py:211-217`). This script
turns a torchvision resnet18 checkpoint into the `.npz` asset the CLI consumes
(`--backbone_ckpt`), verifying the conversion first: the Flax stride-8 dilated
trunk must reproduce a torch-functional forward of the same weights (the exact
backbone configuration MVDeTr trains with, conv1-only block dilation quirk
included — `multiview_detector/models/resnet.py` + `mvdetr.py:103-104`).

Usage:
    python scripts/prepare_backbone.py --src resnet18-f37072fd.pth --out resnet18.npz
    python -m mvdetr_tpu.cli -d wildtrack --data_root ... --backbone_ckpt resnet18.npz

Offline environments: download `resnet18-f37072fd.pth` once on any machine
(https://download.pytorch.org/models/resnet18-f37072fd.pth), copy it here,
and pass it as --src. torchvision is NOT required — only torch (cpu).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_source(src: str):
    import numpy as np

    if src.endswith(".npz"):
        return {k: v for k, v in np.load(src).items()}
    import torch

    sd = torch.load(src, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def torch_resnet18_dilated(sd, x):
    """Reference-contract trunk forward: output stride 8, dilation on conv1
    only per block (the torchvision-copy quirk the reference trains with)."""
    import torch
    import torch.nn.functional as F

    sd = {k: torch.from_numpy(v) for k, v in sd.items()}

    def bn(x, p):
        return F.batch_norm(x, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
                            sd[f"{p}.weight"], sd[f"{p}.bias"], training=False, eps=1e-5)

    def block(x, p, stride, dil1):
        y = F.conv2d(x, sd[f"{p}.conv1.weight"], stride=stride, padding=dil1, dilation=dil1)
        y = F.relu(bn(y, f"{p}.bn1"))
        y = F.conv2d(y, sd[f"{p}.conv2.weight"], padding=1)
        y = bn(y, f"{p}.bn2")
        if f"{p}.downsample.0.weight" in sd:
            x = bn(F.conv2d(x, sd[f"{p}.downsample.0.weight"], stride=stride), f"{p}.downsample.1")
        return F.relu(y + x)

    x = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    x = F.relu(bn(x, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for stage, stride, d0, d1 in [(1, 1, 1, 1), (2, 2, 1, 1), (3, 1, 1, 2), (4, 1, 2, 4)]:
        x = block(x, f"layer{stage}.0", stride, d0)
        x = block(x, f"layer{stage}.1", 1, d1)
    return x


def verify(state_dict) -> float:
    """Max |flax - torch| of the dilated trunk forward on random inputs."""
    import numpy as np
    import torch

    import jax.numpy as jnp
    from mvdetr_tpu.models import ResNetFeatures, load_torchvision_state_dict

    variables = load_torchvision_state_dict(state_dict)
    flax_model = ResNetFeatures(stage_sizes=(2, 2, 2, 2),
                                replace_stride_with_dilation=(False, True, True))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_resnet18_dilated(state_dict, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    out = np.asarray(flax_model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    ))
    return float(np.abs(out - np.transpose(ref.numpy(), (0, 2, 3, 1))).max())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="torchvision resnet18 .pth or .npz")
    p.add_argument("--out", required=True, help="output .npz asset for --backbone_ckpt")
    p.add_argument("--tol", type=float, default=5e-3)
    args = p.parse_args()

    import numpy as np

    sd = load_source(args.src)
    expect = {"conv1.weight", "bn1.weight", "layer4.1.bn2.running_var"}
    missing = expect - set(sd)
    if missing:
        raise SystemExit(f"source does not look like a torchvision resnet18 state_dict; missing {missing}")

    err = verify(sd)
    print(f"flax-vs-torch dilated forward max abs err: {err:.2e}")
    if err > args.tol:
        raise SystemExit(f"conversion verification FAILED (err {err:.2e} > tol {args.tol})")

    np.savez(args.out, **{k: np.asarray(v) for k, v in sd.items()})
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB) — "
          f"pass it to the CLI as --backbone_ckpt {args.out}")


if __name__ == "__main__":
    main()
