"""World-feature fusion modules — the BEV multiview aggregators.

The five variants of the reference model zoo
(`/root/reference/multiview_detector/models/mvdetr.py:122-134`), NHWC:

- ``ConvWorldFeat`` (MVDet): concat views + coord map, dilated conv stack
  (`models/conv_world_feat.py:21-52`),
- ``TransformerWorldFeat``: /4 downsample + dense 3-layer encoder
  (`models/trans_world_feat.py:40-67`),
- ``DeformTransWorldFeat`` — the **shadow transformer** flagship: each camera
  is one attention level, queries are all N*H*W BEV cells with
  geometry-derived reference points (`models/trans_world_feat.py:70-119`),
- ``DeformTransWorldFeatAIO``: views merged first, single-level deformable
  encoder (`models/trans_world_feat.py:122-154`),
- ``DeformConvWorldFeat``: per-view deformable conv then merge
  (`models/conv_world_feat.py:55-76`).

All take ``[B, N, H, W, C]`` and return ``[B, H, W, C]``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mvdetr_tpu.models.deformable import DeformableEncoder, xavier_uniform
from mvdetr_tpu.models.pos_embed import coord_map, sine_pos_embedding
from mvdetr_tpu.models.transformer import TransformerEncoder
from mvdetr_tpu.ops.deform_conv import deform_conv2d


def _resize_bilinear(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, int(out_hw[0]), int(out_hw[1]), c), method="bilinear")


class ConvWorldFeat(nn.Module):
    num_cam: int
    world_shape: Tuple[int, int]
    base_dim: int = 128
    hidden_dim: int = 128
    stride: int = 2
    reduction: Optional[str] = None  # None -> concat views, 'sum' -> add views
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, n, h, w, c = x.shape
        # explicit (1, 1) padding: torch Conv2d(3, stride, 1) parity — Flax
        # 'SAME' would pad (0, 1) at stride 2, a one-pixel shift
        y = nn.Conv(self.hidden_dim, (3, 3), strides=(self.stride,) * 2, padding=[(1, 1)] * 2,
                    dtype=self.dtype, name="downsample")(x.reshape(b * n, h, w, c))
        y = nn.relu(y)
        hs, ws = y.shape[1:3]
        if self.reduction is None:
            y = jnp.moveaxis(y.reshape(b, n, hs, ws, self.hidden_dim), 1, 3).reshape(b, hs, ws, n * self.hidden_dim)
        elif self.reduction == "sum":
            y = y.reshape(b, n, hs, ws, self.hidden_dim).sum(axis=1)
        else:
            raise ValueError(self.reduction)
        cmap = jnp.broadcast_to(jnp.asarray(coord_map((hs, ws)), dtype=y.dtype), (b, hs, ws, 2))
        y = jnp.concatenate([y, cmap], axis=-1)
        for i, dil in enumerate((1, 2, 4)):
            y = nn.Conv(
                self.hidden_dim, (3, 3), padding=[(dil, dil)] * 2, kernel_dilation=(dil, dil),
                dtype=self.dtype, name=f"feat{i}"
            )(y)
            y = nn.relu(y)
        y = _resize_bilinear(y, self.world_shape)
        y = nn.Conv(self.base_dim, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="out")(y)
        return nn.relu(y)


class TransformerWorldFeat(nn.Module):
    num_cam: int
    world_shape: Tuple[int, int]
    base_dim: int = 128
    hidden_dim: int = 128
    nhead: int = 8
    dim_feedforward: int = 512
    dropout: float = 0.1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, n, h, w, c = x.shape
        y = jnp.moveaxis(x, 1, 3).reshape(b, h, w, n * c)
        y = nn.relu(nn.Conv(self.hidden_dim, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name="down0")(y))
        y = nn.relu(nn.Conv(self.hidden_dim, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name="down1")(y))
        hs, ws = y.shape[1:3]
        pos = jnp.asarray(sine_pos_embedding((hs, ws), self.hidden_dim // 2),
                          dtype=y.dtype).reshape(1, hs * ws, self.hidden_dim)
        tokens = y.reshape(b, hs * ws, self.hidden_dim)
        tokens = TransformerEncoder(3, self.hidden_dim, self.nhead, self.dim_feedforward, self.dropout,
                                    name="encoder")(tokens, pos, train)
        y = tokens.reshape(b, hs, ws, self.hidden_dim)
        mid = (int(np.ceil(self.world_shape[0] / 2)), int(np.ceil(self.world_shape[1] / 2)))
        y = _resize_bilinear(y, mid)
        y = nn.relu(nn.Conv(self.hidden_dim, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="up0")(y))
        y = _resize_bilinear(y, self.world_shape)
        y = nn.relu(nn.Conv(self.hidden_dim, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="up1")(y))
        return y


class DeformTransWorldFeat(nn.Module):
    """The shadow transformer (`trans_world_feat.py:70-119`).

    ``reference_points``: static ``[N*Hs*Ws, N, P, 2]`` array from
    ``CameraRig.reference_points`` tiled per camera
    (`models/mvdetr.py:129-130`).
    """

    num_cam: int
    world_shape: Tuple[int, int]
    base_dim: int = 128
    hidden_dim: int = 128
    nhead: int = 8
    dim_feedforward: int = 512
    dropout: float = 0.1
    n_points: int = 4
    stride: int = 2
    reference_points: Optional[np.ndarray] = None
    dtype: object = None
    attn_mode: str = "auto"  # 'auto' | 'gather' | 'windowed'
    attn_radius: int = 4
    mesh: Optional[object] = None  # bev-axis row sharding (`ops/msda_sharded.py`)

    def _resolve_mode(self, hs: int, ws: int) -> str:
        """'auto' -> 'windowed' when the reference map is the identity grid
        (the n_points=4, all-z=0 flagship case, `mvdetr.py:39-40`); 'warped'
        (shadow-warp + windowed, `ops/msda_warped.py`) for general maps like
        the 8-point shadow config (`mvdetr.py:41-44`)."""
        if self.attn_mode != "auto":
            return self.attn_mode
        if self.reference_points is None:
            return "gather"
        ref = np.asarray(self.reference_points)
        ys, xs = np.meshgrid(np.linspace(0.5, hs - 0.5, hs) / hs,
                             np.linspace(0.5, ws - 0.5, ws) / ws, indexing="ij")
        ident = np.stack([xs, ys], -1).reshape(-1, 2)
        ident = np.tile(ident[None, :, None, None, :],
                        (ref.shape[0] // (hs * ws), 1, ref.shape[1], ref.shape[2], 1)).reshape(ref.shape)
        return "windowed" if np.allclose(ref, ident, atol=1e-3) else "warped"

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, n, h, w, c = x.shape
        y = nn.Conv(
            self.hidden_dim, (3, 3), strides=(self.stride,) * 2, padding=[(1, 1)] * 2,
            kernel_init=xavier_uniform, dtype=self.dtype, name="downsample"
        )(x.reshape(b * n, h, w, c))
        y = nn.relu(y)
        hs, ws = y.shape[1:3]

        tokens = y.reshape(b, n * hs * ws, self.hidden_dim)
        pos = jnp.asarray(sine_pos_embedding((hs, ws), self.hidden_dim // 2),
                          dtype=y.dtype).reshape(1, 1, hs * ws, self.hidden_dim)
        lvl = self.param("lvl_embedding", nn.initializers.normal(1.0), (self.num_cam, self.hidden_dim))
        pos_lvl = (pos + lvl[None, :, None, :].astype(y.dtype)).reshape(1, n * hs * ws, self.hidden_dim)

        spatial_shapes = tuple(((hs, ws),) * n)
        tokens = DeformableEncoder(
            num_layers=3,
            d_model=self.hidden_dim,
            d_ffn=self.dim_feedforward,
            dropout=self.dropout,
            n_levels=n,
            n_heads=self.nhead,
            n_points=self.n_points,
            reference_points=self.reference_points,
            dtype=self.dtype,
            mode=self._resolve_mode(hs, ws),
            radius=self.attn_radius,
            mesh=self.mesh,
            name="encoder",
        )(tokens, spatial_shapes, pos_lvl, train)

        y = tokens.reshape(b, n, hs, ws, self.hidden_dim)
        y = jnp.moveaxis(y, 1, 3).reshape(b, hs, ws, n * self.hidden_dim)
        y = nn.relu(nn.Conv(self.hidden_dim, (1, 1), kernel_init=xavier_uniform, dtype=self.dtype,
                            name="merge")(y))
        y = _resize_bilinear(y, self.world_shape)
        y = nn.relu(nn.Conv(self.hidden_dim, (3, 3), padding=[(1, 1)] * 2, kernel_init=xavier_uniform,
                            dtype=self.dtype, name="up")(y))
        return y


class DeformTransWorldFeatAIO(nn.Module):
    """Merge views first, then a single-level deformable encoder (`trans_world_feat.py:122-154`)."""

    num_cam: int
    world_shape: Tuple[int, int]
    base_dim: int = 128
    hidden_dim: int = 128
    nhead: int = 8
    dim_feedforward: int = 512
    dropout: float = 0.1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, n, h, w, c = x.shape
        y = jnp.moveaxis(x, 1, 3).reshape(b, h, w, n * c)
        y = nn.relu(nn.Conv(self.hidden_dim, (1, 1), kernel_init=xavier_uniform, dtype=self.dtype,
                            name="merge")(y))
        pos = jnp.asarray(sine_pos_embedding((h, w), self.hidden_dim // 2),
                          dtype=y.dtype).reshape(1, h * w, self.hidden_dim)
        tokens = DeformableEncoder(
            num_layers=3,
            d_model=self.hidden_dim,
            d_ffn=self.dim_feedforward,
            dropout=self.dropout,
            n_levels=1,
            n_heads=self.nhead,
            dtype=self.dtype,
            name="encoder",
        )(y.reshape(b, h * w, self.hidden_dim), ((h, w),), pos, train)
        y = tokens.reshape(b, h, w, self.hidden_dim)
        y = nn.relu(nn.Conv(self.hidden_dim, (1, 1), kernel_init=xavier_uniform, dtype=self.dtype,
                            name="output")(y))
        return y


class DeformConvWorldFeat(nn.Module):
    """Per-view deformable conv + merge (`conv_world_feat.py:55-76`)."""

    num_cam: int
    world_shape: Tuple[int, int]
    base_dim: int = 128
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, n, h, w, c = x.shape
        pos = jnp.asarray(sine_pos_embedding((h, w), self.base_dim // 2))[None]
        feats = []
        for cam in range(n):
            f = x[:, cam] + pos
            off = nn.Conv(9 * 2, (1, 1), name=f"deform_pos{cam}")(f).reshape(b, h, w, 9, 2)
            weight = self.param(f"deform_weight{cam}", nn.initializers.he_normal(), (3, 3, c, self.base_dim))
            bias = self.param(f"deform_bias{cam}", nn.initializers.zeros, (self.base_dim,))
            feats.append(nn.relu(deform_conv2d(f, off, weight, bias)))
        y = jnp.concatenate(feats, axis=-1)
        y = nn.relu(nn.Conv(self.hidden_dim, (1, 1), name="merge")(y))
        for i, dil in enumerate((1, 2, 4)):
            y = nn.Conv(
                self.hidden_dim, (3, 3), padding=[(dil, dil)] * 2, kernel_dilation=(dil, dil), name=f"feat{i}"
            )(y)
            y = nn.relu(y)
        return y


def build_world_feat(arch: str, num_cam: int, world_shape, base_dim: int = 128,
                     reference_points: Optional[np.ndarray] = None, n_points: int = 4,
                     dtype=None, attn_mode: str = "auto", attn_radius: int = 4,
                     mesh=None) -> nn.Module:
    """Variant dispatch, mirroring `models/mvdetr.py:122-134`."""
    world_shape = tuple(int(v) for v in world_shape)
    # hidden_dim tracks base_dim (both default to 128 in the reference zoo) so
    # every variant returns base_dim channels for the world heads.
    if arch == "conv":
        return ConvWorldFeat(num_cam, world_shape, base_dim, hidden_dim=base_dim, dtype=dtype,
                             name="world_feat")
    if arch == "trans":
        return TransformerWorldFeat(num_cam, world_shape, base_dim, hidden_dim=base_dim, dtype=dtype,
                                    name="world_feat")
    if arch == "deform_conv":
        return DeformConvWorldFeat(num_cam, world_shape, base_dim, hidden_dim=base_dim, name="world_feat")
    if arch == "deform_trans":
        return DeformTransWorldFeat(
            num_cam, world_shape, base_dim, hidden_dim=base_dim,
            n_points=n_points, reference_points=reference_points, dtype=dtype,
            attn_mode=attn_mode, attn_radius=attn_radius, mesh=mesh, name="world_feat"
        )
    if arch == "aio":
        return DeformTransWorldFeatAIO(num_cam, world_shape, base_dim, hidden_dim=base_dim, dtype=dtype,
                                       name="world_feat")
    raise ValueError(f"unknown world_feat arch: {arch}")
