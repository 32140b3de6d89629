"""Import the reference torch MVDeTr on CPU for full-model parity tests.

The reference model (`/root/reference/multiview_detector/models/mvdetr.py`)
imports torchvision, kornia, and its compiled CUDA extension — none available
here. This helper installs minimal shims before importing it read-only:

- ``MultiScaleDeformableAttention``: forwards to the reference's own
  pure-torch oracle (`ms_deform_attn_func.py:41-61`), so the torch model runs
  with reference-exact attention math on CPU;
- ``kornia.warp_perspective``: re-implements kornia's documented math in
  ~15 lines of torch (corner-aligned (size-1) homography normalization +
  ``F.grid_sample(align_corners=False)`` — the exact combination the
  reference calls at `mvdetr.py:194`);
- ``torchvision``: attribute stubs (only ``resnet18`` is exercised; its
  pretrained-URL loader is patched to a locally generated random state_dict
  since this environment has no egress).

Everything here is test scaffolding: the reference code itself is imported
from /root/reference and never copied.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REF_PATH = "/root/reference"


def _fake_kornia():
    import torch
    import torch.nn.functional as F

    def warp_perspective(src, M, dsize, mode="bilinear", padding_mode="zeros", align_corners=False):
        b, c, h, w = src.shape
        h_out, w_out = int(dsize[0]), int(dsize[1])

        def norm_mat(height, width):
            m = torch.eye(3, dtype=torch.float64)
            m[0, 0] = 2.0 / (width - 1)
            m[1, 1] = 2.0 / (height - 1)
            m[0, 2] = -1.0
            m[1, 2] = -1.0
            return m

        n_dst, n_src = norm_mat(h_out, w_out), norm_mat(h, w)
        m64 = M.to(torch.float64)
        dst_from_src_n = n_dst @ m64 @ torch.inverse(n_src)
        src_from_dst_n = torch.inverse(dst_from_src_n)

        ys = torch.linspace(-1.0, 1.0, h_out, dtype=torch.float64)
        xs = torch.linspace(-1.0, 1.0, w_out, dtype=torch.float64)
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        pts = torch.stack([gx, gy, torch.ones_like(gx)], dim=-1).reshape(1, -1, 3)
        out = torch.einsum("bij,bqj->bqi", src_from_dst_n, pts.expand(src_from_dst_n.shape[0], -1, 3))
        grid = (out[..., :2] / out[..., 2:3]).reshape(-1, h_out, w_out, 2).to(src.dtype)
        return F.grid_sample(src, grid, mode=mode, padding_mode=padding_mode, align_corners=align_corners)

    mod = types.ModuleType("kornia")
    mod.warp_perspective = warp_perspective
    return mod


def _fake_msda():
    mod = types.ModuleType("MultiScaleDeformableAttention")

    def ms_deform_attn_forward(value, shapes, level_start_index, loc, weights, im2col_step):
        from multiview_detector.models.ops.functions.ms_deform_attn_func import (
            ms_deform_attn_core_pytorch,
        )

        return ms_deform_attn_core_pytorch(value, shapes, loc, weights)

    def ms_deform_attn_backward(*a, **k):  # pragma: no cover - forward-only shims
        raise NotImplementedError("CPU shim is forward-only")

    mod.ms_deform_attn_forward = ms_deform_attn_forward
    mod.ms_deform_attn_backward = ms_deform_attn_backward
    return mod


def _fake_torchvision():
    import torch.nn as nn

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    transforms = types.ModuleType("torchvision.transforms")
    ops = types.ModuleType("torchvision.ops")

    def _unavailable(*a, **k):  # pragma: no cover
        raise RuntimeError("torchvision is not available in this environment")

    models.vgg11 = _unavailable
    for name in ("Resize", "ToPILImage", "Compose", "Normalize", "ToTensor"):
        setattr(transforms, name, _unavailable)

    class DeformConv2d(nn.Module):
        """Pure-torch reimplementation of ``torchvision.ops.DeformConv2d``
        (torchvision itself is not installed here). Semantics per the
        torchvision docs / DCNv1: ``offset`` has ``2*kh*kw`` channels ordered
        as (dy, dx) pairs per kernel tap in row-major tap order; each tap
        samples ``x`` bilinearly (zero padding outside) at
        ``p0 + p_k + dp_k`` and the taps are mixed by the conv weights.
        Restricted to the configuration the reference uses
        (`conv_world_feat.py:60`): stride 1, dilation 1, groups 1."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, bias=True):
            super().__init__()
            import math

            import torch

            assert stride == 1 and dilation == 1 and groups == 1
            kh = kw = kernel_size if isinstance(kernel_size, int) else None
            if kh is None:
                kh, kw = kernel_size
            self.kh, self.kw, self.padding = kh, kw, padding
            self.weight = nn.Parameter(torch.empty(out_channels, in_channels, kh, kw))
            nn.init.kaiming_uniform_(self.weight, a=math.sqrt(5))
            if bias:
                fan_in = in_channels * kh * kw
                bound = 1.0 / math.sqrt(fan_in)
                self.bias = nn.Parameter(torch.empty(out_channels).uniform_(-bound, bound))
            else:
                self.bias = None

        def forward(self, x, offset):
            import torch

            b, cin, h, w = x.shape
            kh, kw, pad = self.kh, self.kw, self.padding
            off = offset.reshape(b, kh * kw, 2, h, w)
            ys = torch.arange(h, dtype=x.dtype)[:, None].expand(h, w)
            xs = torch.arange(w, dtype=x.dtype)[None, :].expand(h, w)

            def bilinear(sy, sx):  # zero-padded bilinear gather, [B, H, W] coords
                y0 = torch.floor(sy)
                x0 = torch.floor(sx)
                wy, wx = sy - y0, sx - x0
                out = torch.zeros(b, cin, h, w, dtype=x.dtype)
                for dy, wyy in ((0, 1 - wy), (1, wy)):
                    for dx, wxx in ((0, 1 - wx), (1, wx)):
                        yi = (y0 + dy).long()
                        xi = (x0 + dx).long()
                        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
                        yc = yi.clamp(0, h - 1)
                        xc = xi.clamp(0, w - 1)
                        tap = x[torch.arange(b)[:, None, None], :, yc, xc]  # [B, H, W, Cin]
                        tap = tap.permute(0, 3, 1, 2)
                        out = out + tap * (wyy * wxx * ok.to(x.dtype))[:, None]
                return out

            out = None
            for k in range(kh * kw):
                ki, kj = divmod(k, kw)
                sy = ys[None] + (ki - pad) + off[:, k, 0]
                sx = xs[None] + (kj - pad) + off[:, k, 1]
                tap = bilinear(sy, sx)  # [B, Cin, H, W]
                mixed = torch.einsum("bchw,oc->bohw", tap, self.weight[:, :, ki, kj])
                out = mixed if out is None else out + mixed
            if self.bias is not None:
                out = out + self.bias[None, :, None, None]
            return out

    ops.DeformConv2d = DeformConv2d
    tv.models = models
    tv.transforms = transforms
    tv.ops = ops
    return {
        "torchvision": tv,
        "torchvision.models": models,
        "torchvision.transforms": transforms,
        "torchvision.ops": ops,
    }


def import_reference_mvdetr():
    """Install shims, import and return the reference's mvdetr module.

    The pretrained-resnet URL loader is patched to return a deterministic
    randomized state_dict (seeded, with perturbed BN running stats) so the
    parity test exercises nontrivial weights without network access.
    """
    import torch

    if "kornia" not in sys.modules:
        sys.modules["kornia"] = _fake_kornia()
    if "MultiScaleDeformableAttention" not in sys.modules:
        sys.modules["MultiScaleDeformableAttention"] = _fake_msda()
    if "torchvision" not in sys.modules:
        sys.modules.update(_fake_torchvision())
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)

    import multiview_detector.models.resnet as ref_resnet

    def fake_url_loader(url, progress=True, **kw):
        torch.manual_seed(7)
        m = ref_resnet.resnet18(pretrained=False)
        sd = m.state_dict()
        gen = np.random.default_rng(11)
        for k, v in sd.items():
            if v.dtype.is_floating_point:
                noise = torch.from_numpy(
                    gen.normal(0, 0.05, size=tuple(v.shape)).astype(np.float32)
                )
                if k.endswith("running_var"):
                    sd[k] = (v + noise.abs()).clamp_min(0.1)
                else:
                    sd[k] = v + noise
        return sd

    ref_resnet.load_state_dict_from_url = fake_url_loader

    import multiview_detector.models.mvdetr as ref_mvdetr

    return ref_mvdetr


class RefDatasetShim:
    """Duck-types the reference ``frameDataset`` attributes that
    ``MVDeTr.__init__``/``create_reference_map`` read (`mvdetr.py:78-95,33-71`),
    backed by a :class:`mvdetr_tpu.geometry.CameraRig`."""

    def __init__(self, rig, world_reduce=2, img_reduce=8):
        self.num_cam = rig.num_cam
        self.world_reduce = world_reduce
        self.img_reduce = img_reduce
        self.Rworld_shape = list(rig.Rworld_shape(world_reduce))
        self.Rimg_shape = [int(np.ceil(s / 8)) for s in rig.img_shape]
        self.base = types.SimpleNamespace(
            worldcoord_from_worldgrid_mat=rig.worldcoord_from_worldgrid_mat,
            world_indexing_from_xy_mat=rig.world_indexing_from_xy_mat,
            intrinsic_matrices=rig.intrinsic_matrices,
            extrinsic_matrices=rig.extrinsic_matrices,
            worldcoord_unit=rig.worldcoord_unit,
        )
