"""Torch -> Flax checkpoint interop for the full MVDeTr model.

The reference trains and ships full-model checkpoints as a flat
``state_dict`` saved to ``MultiviewDetector.pth``
(`/root/reference/main.py:142-147`, distributed per `README.md:79`). This
module converts such a state_dict — covering every module of
`/root/reference/multiview_detector/models/mvdetr.py:97-147` — into the
parameter pytree of :class:`mvdetr_tpu.models.MVDeTr`, so a published
checkpoint can be evaluated on TPU the day real data is available
(``cli.py --load_torch_ckpt``).

Layout conversions:
- Conv2d ``weight`` OIHW -> Flax HWIO;
- Linear ``weight`` [out, in] -> Flax Dense ``kernel`` [in, out];
- LayerNorm/BatchNorm ``weight``/``bias`` -> ``scale``/``bias`` (+ running
  stats into ``batch_stats``);
- nn.MultiheadAttention packed ``in_proj_weight`` [3C, C] -> per-head
  query/key/value kernels ``[C, H, Dh]`` (vanilla 'trans' variant only).

Sequential-index to named-module maps follow the reference constructors:
``base`` is ``nn.Sequential(resnet18 children)[:-2]`` so index 0/1/4..7 are
conv1/bn1/layer1..layer4 (`mvdetr.py:103-104`); heads are
``Sequential(Conv3x3, ReLU, Conv1x1)`` or ``Sequential(Conv1x1)``
(`mvdetr.py:24-30`); world-feat submodule indices per
`models/trans_world_feat.py` / `models/conv_world_feat.py`.

For eval parity of converted checkpoints, build the model with
``warp_convention='kornia'`` (see :class:`MVDeTr`) and
``attn_mode='gather'`` (reference-exact attention) — or much faster,
``attn_mode='windowed'`` with an auto-picked radius (see
:func:`suggest_attn_radius`; radius 8 runs 40 ms/layer on the unrolled
kernel, radius 16 — enough for any measured checkpoint reach — 233 ms on
the grid-axis kernel vs 922 ms gather) and watch the eval
``offset_clip_fraction`` log line: near zero means the clamp never binds on
the loaded offsets and the fast path is numerically equivalent.

Kornia-version assumption: the 'kornia' warp convention reproduces
``kornia.warp_perspective(dst_norm_trans_src_norm, align_corners=False)``
as of kornia 0.5-0.6 (the releases contemporary with the reference,
whose requirements pin no version): pixel p maps through
``x_norm = x * 2/(W-1) - 1`` THEN the normalized-coordinate homography —
i.e. the half-pixel-off grid the shim in ``tests/_reference_torch.py``
encodes and ``tests/test_torch_parity.py`` validates. Later kornia
releases reworked ``warp_perspective``'s align_corners handling; a
checkpoint trained against one of those could be off by ~half a feature
pixel with no telemetry to catch it. If real checkpoints ever disagree
at eval, A/B ``--warp_convention center`` vs ``kornia`` — the MODA delta
between the two bounds the worst-case convention error.
"""

from __future__ import annotations

import warnings

import numpy as np

__all__ = [
    "convert_reference_state_dict",
    "detect_reference_config",
    "load_torch_checkpoint",
]


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


class _SD:
    """State-dict view that records consumed keys (for coverage checking)."""

    def __init__(self, sd):
        self.sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
        self.used = set()

    def __contains__(self, key):
        return key in self.sd

    def get(self, key) -> np.ndarray:
        self.used.add(key)
        return _np(self.sd[key])

    def unused(self):
        return [
            k for k in self.sd
            if k not in self.used and not k.endswith("num_batches_tracked")
        ]


def _conv(sd: _SD, prefix: str) -> dict:
    out = {"kernel": np.transpose(sd.get(f"{prefix}.weight"), (2, 3, 1, 0))}  # OIHW -> HWIO
    if f"{prefix}.bias" in sd:
        out["bias"] = sd.get(f"{prefix}.bias")
    return out


def _dense(sd: _SD, prefix: str) -> dict:
    return {"kernel": sd.get(f"{prefix}.weight").T, "bias": sd.get(f"{prefix}.bias")}


def _ln(sd: _SD, prefix: str) -> dict:
    return {"scale": sd.get(f"{prefix}.weight"), "bias": sd.get(f"{prefix}.bias")}


def _head(sd: _SD, name: str) -> dict:
    # output_head (`mvdetr.py:24-30`): Sequential(Conv3x3, ReLU, Conv1x1) when
    # outfeat_dim else Sequential(Conv1x1)
    if f"{name}.2.weight" in sd:
        return {"neck": _conv(sd, f"{name}.0"), "proj": _conv(sd, f"{name}.2")}
    return {"proj": _conv(sd, f"{name}.0")}


def _mha(sd: _SD, prefix: str, nhead: int) -> dict:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    w = sd.get(f"{prefix}.in_proj_weight")  # [3C, C], rows stacked q;k;v
    b = sd.get(f"{prefix}.in_proj_bias")
    c = w.shape[1]
    dh = c // nhead
    out = {}
    for i, part in enumerate(("query", "key", "value")):
        wi = w[i * c:(i + 1) * c]  # [C_out, C_in]
        out[part] = {
            "kernel": wi.T.reshape(c, nhead, dh),
            "bias": b[i * c:(i + 1) * c].reshape(nhead, dh),
        }
    out["out"] = {
        "kernel": sd.get(f"{prefix}.out_proj.weight").T.reshape(nhead, dh, c),
        "bias": sd.get(f"{prefix}.out_proj.bias"),
    }
    return out


def _deform_layer(sd: _SD, prefix: str) -> dict:
    """DeformableTransformerEncoderLayer (`deformable_transformer.py:55-69`)."""
    return {
        "self_attn": {
            "value_proj": _dense(sd, f"{prefix}.self_attn.value_proj"),
            "sampling_offsets": _dense(sd, f"{prefix}.self_attn.sampling_offsets"),
            "attention_weights": _dense(sd, f"{prefix}.self_attn.attention_weights"),
            "output_proj": _dense(sd, f"{prefix}.self_attn.output_proj"),
        },
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "linear1": _dense(sd, f"{prefix}.linear1"),
        "linear2": _dense(sd, f"{prefix}.linear2"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
    }


def _count_layers(sd: _SD, fmt: str) -> int:
    n = 0
    while fmt.format(n) in sd:
        n += 1
    return n


# torchvision resnet18 children kept by `nn.Sequential(...children())[:-2]`
# (`mvdetr.py:103-104`): 0=conv1 1=bn1 2=relu 3=maxpool 4..7=layer1..4
_RESNET_SEQ = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2", "6": "layer3", "7": "layer4"}


def detect_reference_config(state_dict) -> dict:
    """Infer (arch, world_feat_arch, bottleneck_dim, outfeat_dim, num_cam)
    from a reference state_dict's key structure."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in state_dict.items()}
    cfg = {}
    w0 = _np(sd["base.0.weight"])
    cfg["arch"] = "resnet18" if w0.shape[2] == 7 else "vgg11"
    cfg["bottleneck_dim"] = int(_np(sd["bottleneck.0.weight"]).shape[0]) if "bottleneck.0.weight" in sd else 0
    cfg["outfeat_dim"] = int(_np(sd["img_heatmap.0.weight"]).shape[0]) if "img_heatmap.2.weight" in sd else 0
    if "world_feat.lvl_embedding" in sd:
        cfg["world_feat_arch"] = "deform_trans"
        cfg["num_cam"] = int(_np(sd["world_feat.lvl_embedding"]).shape[0])
        # sampling_offsets out = heads * levels(=num_cam) * points * 2 (`ms_deform_attn.py:55`).
        # nhead is NOT recoverable from the weight shapes alone (only the
        # product M*L*P is); the reference hard-wires 8 heads
        # (`trans_world_feat.py:76`), so assert that assumption loudly
        # instead of silently inferring a wrong n_points.
        off = int(_np(sd["world_feat.encoder.layers.0.self_attn.sampling_offsets.weight"]).shape[0])
        nhead = 8
        denom = nhead * cfg["num_cam"] * 2
        if off % denom or not 1 <= off // denom <= 16:
            raise ValueError(
                f"sampling_offsets out-dim {off} is inconsistent with the assumed "
                f"{nhead} attention heads x {cfg['num_cam']} cameras "
                f"(`trans_world_feat.py:76` hard-wires nhead=8); this checkpoint "
                f"was likely trained with a modified nhead — conversion needs a "
                f"matching MSDeformAttn config."
            )
        cfg["n_points"] = off // denom
    elif "world_feat.encoder.layers.0.self_attn.in_proj_weight" in sd:
        cfg["world_feat_arch"] = "trans"
    elif "world_feat.encoder.layers.0.self_attn.value_proj.weight" in sd:
        cfg["world_feat_arch"] = "aio"
    elif "world_feat.deform_conv.0.weight" in sd:
        cfg["world_feat_arch"] = "deform_conv"
        cfg["num_cam"] = _count_layers(_SD(sd), "world_feat.deform_conv.{}.weight")
    else:
        cfg["world_feat_arch"] = "conv"
    return cfg


def suggest_attn_radius(state_dict, lo: int = 4, hi: int = 16):
    """Pick a windowed-attention radius for a converted checkpoint from a
    host-side scan of its ``sampling_offsets`` biases.

    The offsets head is ``W @ query + b`` with ``W`` zero-initialized and the
    radial ring prior in ``b`` (`ms_deform_attn.py:62-77`); after training
    the bias carries the bulk of the learned reach, so ``ceil(max|b|) + 1``
    covers the static part with one spare cell. The data-dependent ``W``
    contribution cannot be bounded offline — the eval-time
    ``offset_clip_fraction`` log line reports whether the chosen radius
    actually binds. Result clamped to [lo, hi]; hi defaults to 16 — the
    grid-axis forward kernel compiles at any radius (round 5; 233 ms/layer
    at radius 16 vs 922 ms reference-exact gather), while radius <= 8 rides
    the faster unrolled kernel (40 ms at radius 8).

    Returns ``(radius, max_abs_bias)``.
    """
    import math

    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in state_dict.items()}
    biases = [v for k, v in sd.items() if k.endswith("sampling_offsets.bias")]
    if not biases:
        return lo, 0.0
    reach = max(float(np.abs(_np(b)).max()) for b in biases)
    return int(min(max(math.ceil(reach) + 1, lo), hi)), reach


def convert_reference_state_dict(state_dict, nhead: int = 8, strict: bool = True) -> dict:
    """Convert a full reference ``MultiviewDetector.pth`` state_dict to
    ``{"params": ..., "batch_stats": ...}`` for :class:`MVDeTr`.

    ``strict``: raise if any checkpoint key was not consumed (catches silent
    mapping gaps); set False to only warn.
    """
    from mvdetr_tpu.models.resnet import load_torchvision_state_dict
    from mvdetr_tpu.models.vgg import load_torchvision_vgg11_state_dict

    cfg = detect_reference_config(state_dict)
    sd = _SD(state_dict)

    params, stats = {}, {}

    # ------------------------------------------------------------- backbone
    base_keys = [k for k in sd.sd if k.startswith("base.")]
    if cfg["arch"] == "resnet18":
        renamed = {}
        for k in base_keys:
            idx, rest = k[len("base."):].split(".", 1)
            renamed[f"{_RESNET_SEQ[idx]}.{rest}"] = sd.sd[k]
            sd.used.add(k)
        sub = load_torchvision_state_dict(renamed)
    else:  # vgg11: base = vgg.features -> keys base.{i}.weight
        renamed = {"features." + k[len("base."):]: sd.sd[k] for k in base_keys}
        for k in base_keys:
            sd.used.add(k)
        sub = load_torchvision_vgg11_state_dict(renamed)
    params["base"] = sub["params"]
    if "batch_stats" in sub:
        stats["base"] = sub["batch_stats"]

    # ----------------------------------------------------- bottleneck/heads
    if cfg["bottleneck_dim"]:
        params["bottleneck"] = _conv(sd, "bottleneck.0")
    for head in ("img_heatmap", "img_offset", "img_wh", "world_heatmap", "world_offset"):
        params[head] = _head(sd, head)

    # ----------------------------------------------------------- world feat
    arch = cfg["world_feat_arch"]
    wf = {}
    if arch == "deform_trans":
        wf["downsample"] = _conv(sd, "world_feat.downsample.0")
        wf["lvl_embedding"] = sd.get("world_feat.lvl_embedding")
        n_layers = _count_layers(sd, "world_feat.encoder.layers.{}.norm1.weight")
        wf["encoder"] = {
            f"layer{i}": _deform_layer(sd, f"world_feat.encoder.layers.{i}") for i in range(n_layers)
        }
        wf["merge"] = _conv(sd, "world_feat.merge_linear.0")
        wf["up"] = _conv(sd, "world_feat.upsample.1")
    elif arch == "conv":
        wf["downsample"] = _conv(sd, "world_feat.downsample.0")
        for i, t in enumerate((0, 2, 4)):
            wf[f"feat{i}"] = _conv(sd, f"world_feat.world_feat.{t}")
        wf["out"] = _conv(sd, "world_feat.upsample.1")
    elif arch == "trans":
        wf["down0"] = _conv(sd, "world_feat.downsample.0")
        wf["down1"] = _conv(sd, "world_feat.downsample.2")
        n_layers = _count_layers(sd, "world_feat.encoder.layers.{}.norm1.weight")
        wf["encoder"] = {}
        for i in range(n_layers):
            p = f"world_feat.encoder.layers.{i}"
            wf["encoder"][f"layer{i}"] = {
                "self_attn": _mha(sd, f"{p}.self_attn", nhead),
                "norm1": _ln(sd, f"{p}.norm1"),
                "linear1": _dense(sd, f"{p}.linear1"),
                "linear2": _dense(sd, f"{p}.linear2"),
                "norm2": _ln(sd, f"{p}.norm2"),
            }
        wf["up0"] = _conv(sd, "world_feat.upsample.1")
        wf["up1"] = _conv(sd, "world_feat.upsample.4")
    elif arch == "aio":
        wf["merge"] = _conv(sd, "world_feat.merge.0")
        n_layers = _count_layers(sd, "world_feat.encoder.layers.{}.norm1.weight")
        wf["encoder"] = {
            f"layer{i}": _deform_layer(sd, f"world_feat.encoder.layers.{i}") for i in range(n_layers)
        }
        wf["output"] = _conv(sd, "world_feat.output.0")
    elif arch == "deform_conv":
        # NOTE: torchvision DeformConv2d offsets interleave (dy, dx) per tap;
        # ops/deform_conv.py takes [..., 9, 2] as (dx, dy)-last — permute the
        # offset conv's output channels accordingly.
        n = cfg["num_cam"]
        for cam in range(n):
            pc = _conv(sd, f"world_feat.deform_pos.{cam}")
            k = pc["kernel"]  # [1, 1, C, 18] ordered (y0, x0, y1, x1, ...)
            perm = np.arange(18).reshape(9, 2)[:, ::-1].reshape(-1)
            pc = {"kernel": k[..., perm], "bias": pc["bias"][perm]}
            wf[f"deform_pos{cam}"] = pc
            wf[f"deform_weight{cam}"] = np.transpose(
                sd.get(f"world_feat.deform_conv.{cam}.weight"), (2, 3, 1, 0)
            )
            wf[f"deform_bias{cam}"] = sd.get(f"world_feat.deform_conv.{cam}.bias")
        wf["merge"] = _conv(sd, "world_feat.merge_linear.0")
        for i, t in enumerate((0, 2, 4)):
            wf[f"feat{i}"] = _conv(sd, f"world_feat.world_feat.{t}")
    else:
        raise ValueError(f"unknown world_feat arch: {arch}")
    params["world_feat"] = wf

    leftovers = sd.unused()
    if leftovers:
        msg = f"unconsumed checkpoint keys ({len(leftovers)}): {leftovers[:8]}..."
        if strict:
            raise ValueError(msg)
        warnings.warn(msg)

    import jax.numpy as jnp
    import jax

    tree = {"params": params, "batch_stats": stats}
    return jax.tree_util.tree_map(jnp.asarray, tree)


def load_torch_checkpoint(path: str, strict: bool = True, with_config: bool = False):
    """Load ``MultiviewDetector.pth`` (torch) and convert. Returns
    ``{"params": ..., "batch_stats": ...}`` (plus the detected reference
    config when ``with_config``)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd and not any(hasattr(v, "shape") for v in sd.values()):
        sd = sd["state_dict"]
    out = convert_reference_state_dict(sd, strict=strict)
    return (out, detect_reference_config(sd)) if with_config else out
