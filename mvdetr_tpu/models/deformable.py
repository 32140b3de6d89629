"""Deformable-attention modules (Flax).

Module contracts from the reference
(`/root/reference/multiview_detector/models/ops/modules/ms_deform_attn.py:30-117`
and `models/deformable_transformer.py:22-86`), with the sampling core provided
by :mod:`mvdetr_tpu.ops.msda`.

MVDeTr specifics preserved:
- ``reference_points`` may carry an extra per-point axis
  (``[B, Q, L, P, 2]``), broadcast against the learned offsets
  (`ms_deform_attn.py:104-107`) — the "shadow" prior,
- attention weights are softmax-normalized jointly over (levels, points)
  (`ms_deform_attn.py:101-102`),
- the radial sampling-offset bias initialization (`ms_deform_attn.py:62-71`).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mvdetr_tpu.ops.msda import ms_deform_attn, ms_deform_attn_same_shape
from mvdetr_tpu.ops.msda_warped import ms_deform_attn_warped
from mvdetr_tpu.ops.msda_windowed import windowed_attention

xavier_uniform = nn.initializers.xavier_uniform()


def radial_offset_bias(n_heads: int, n_levels: int, n_points: int,
                       max_radius: Optional[float] = None) -> np.ndarray:
    """Head-h points initialize along direction 2*pi*h/H, ring radius i+1 per
    point (`ms_deform_attn.py:62-71`). ``max_radius`` rescales the rings so the
    outermost lands exactly at the windowed clamp instead of beyond it."""
    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(n_heads, 1, 1, 2), (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    if max_radius is not None and n_points > max_radius:
        grid *= max_radius / n_points
    return grid.reshape(-1).astype(np.float32)


def _clip_fraction_diag(offsets: jnp.ndarray, radius: float) -> jnp.ndarray:
    """Fraction of learned offsets clamped by the windowed radius (the
    telemetry the trainer logs; interop.py guidance signal).

    Formulation note (round-5 finding): the flagship-scale EVAL graph in f32
    compute runs at the HBM cliff of the attached worker at batch 2, and the
    tunnel reports the resulting OOM as a hard TPU-worker crash (rarely as a
    clean RESOURCE_EXHAUSTED). Whether a given process survives depends on
    marginal live-buffer details — including which clip-reduce formulation
    is fused into the graph (an extensive probe matrix in round 5: identical
    HLO passed or crashed depending only on co-resident buffers; bf16
    compute passes everywhere). The default "staged" formulation — partial
    reduce to [B, Q], optimization_barrier, then the tiny mean — keeps the
    smallest live set of the variants tried and reports the identical
    fraction. ``MVDETR_CLIP_DIAG`` selects a variant (mean_bool / int_sum /
    max_abs / none) for A/B on future toolchains."""
    variant = os.environ.get("MVDETR_CLIP_DIAG", "staged")
    r = float(radius)
    if variant == "none":  # telemetry off (last-resort escape hatch)
        return jnp.zeros(())
    if variant == "mean_bool":  # the original formulation
        return jnp.mean((jnp.abs(offsets) > r).astype(jnp.float32))
    if variant == "max_abs":  # max offset reach instead of clamp fraction
        return jnp.max(jnp.abs(offsets))
    if variant == "int_sum":  # integer count reduce, float divide at the end
        cnt = jnp.sum((jnp.abs(offsets) > r).astype(jnp.int32))
        return cnt.astype(jnp.float32) / float(offsets.size)
    part = jnp.mean((jnp.abs(offsets) > r).astype(jnp.float32), axis=tuple(range(2, offsets.ndim)))
    return jnp.mean(jax.lax.optimization_barrier(part))


class MSDeformAttn(nn.Module):
    """``mode``:

    - ``'gather'``: faithful reference semantics — arbitrary reference points,
      XLA-gather sampling (`ops/msda.py`),
    - ``'windowed'``: the TPU fast path (`ops/msda_windowed.py`) — dense
      shifted-window sampling, exact for identity reference points with
      offsets clamped to ``radius`` cells. Requires same-shape levels and
      queries that are aligned copies of the level grid.
    - ``'warped'``: the TPU fast path for general (non-identity) reference
      maps, e.g. the 8-point shadow config — shadow-warp the value stack
      once, then windowed sampling on the warped charts
      (`ops/msda_warped.py`). Same alignment requirements as 'windowed'.

    ``mesh``: when it carries a ``bev`` axis of size > 1 (and the mode is
    'windowed'), the attention runs BEV-row-sharded with a ±radius halo
    exchange over ICI (`ops/msda_sharded.py`, SURVEY §2.8 long-context
    scaling) instead of each device holding the full grid.
    """

    d_model: int = 128
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: object = None
    mode: str = "gather"
    radius: int = 4
    mesh: Optional[object] = None

    def _bev_shards(self, h: int) -> int:
        """BEV-row shard count, or 1 when inapplicable (no mesh / no ``bev``
        axis / rows not divisible / shards thinner than the halo). A
        requested-but-unusable ``bev`` axis is reported loudly — a silent
        fallback would leave ``--bev_shards N`` quietly doing nothing."""
        if self.mesh is None:
            return 1
        n = int(dict(self.mesh.shape).get("bev", 1))
        if n <= 1:
            return 1
        from mvdetr_tpu.ops.msda_windowed import log_fallback_once

        if self.mode != "windowed":
            log_fallback_once(
                f"bev_shards_mode_{self.mode}",
                f"mesh has bev={n} but attention mode is '{self.mode}' — BEV-row "
                f"sharding only applies to 'windowed'; running unsharded",
            )
            return 1
        if h % n != 0 or h // n < self.radius:
            log_fallback_once(
                f"bev_shards_{h}_{n}",
                f"mesh has bev={n} but encoder rows {h} are not divisible into "
                f">={self.radius}-row shards — running unsharded (pick bev_shards "
                f"dividing {h})",
            )
            return 1
        return n

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Q, C]
        reference_points: jnp.ndarray,  # [B, Q, L, 2] or [B, Q, L, P, 2]; ignored in windowed mode
        input_flatten: jnp.ndarray,  # [B, S, C]
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jnp.ndarray:
        m, l, p = self.n_heads, self.n_levels, self.n_points
        d = self.d_model // m
        b, q, _ = query.shape
        s = input_flatten.shape[1]
        assert sum(int(h) * int(w) for h, w in spatial_shapes) == s

        value = nn.Dense(self.d_model, kernel_init=xavier_uniform, dtype=self.dtype,
                         name="value_proj")(input_flatten)
        value = value.reshape(b, s, m, d)

        max_r = float(self.radius) if self.mode in ("windowed", "warped") else None
        offsets = nn.Dense(
            m * l * p * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.asarray(radial_offset_bias(m, l, p, max_radius=max_r)),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).reshape(b, q, m, l, p, 2).astype(jnp.float32)
        weights = nn.Dense(
            m * l * p, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="attention_weights"
        )(query).reshape(b, q, m, l * p)
        # softmax in f32 for stability, sampling weights cast to the value dtype
        weights = nn.softmax(weights.astype(jnp.float32), axis=-1).reshape(b, q, m, l, p)
        weights = weights.astype(value.dtype)

        shapes = tuple((int(h_), int(w_)) for h_, w_ in spatial_shapes)
        normalizer = jnp.asarray([[float(w2), float(h2)] for h2, w2 in shapes], dtype=jnp.float32)
        if reference_points.ndim == 4:  # [B, Q, L, 2]
            ref = reference_points[:, :, None, :, None, :]
        elif reference_points.ndim == 5:  # [B, Q, L, P, 2] — MVDeTr per-point refs
            ref = reference_points[:, :, None, :, :, :]
        else:
            raise ValueError(f"bad reference_points rank: {reference_points.shape}")

        # Shadow-figure capture (`mvdetr.py:163-175` parity): dead code under
        # jit unless the caller requests mutable=["intermediates"].
        off_viz = jnp.clip(offsets, -float(self.radius), float(self.radius)) \
            if self.mode in ("windowed", "warped") else offsets
        self.sow("intermediates", "viz_sampling_locations",
                 ref + off_viz / normalizer[None, None, None, :, None, :])
        self.sow("intermediates", "viz_attention_weights", weights)
        if self.mode in ("windowed", "warped"):
            # own (scalar-only) collection so the train step can request it
            # without materializing the viz tensors above — logged every
            # log_interval by the trainer (windowed-clamp health signal)
            self.sow("diagnostics", "offset_clip_fraction",
                     _clip_fraction_diag(offsets, float(self.radius)))

        if self.mode in ("windowed", "warped"):
            h_, w_ = shapes[0]
            assert len(set(shapes)) == 1 and q % (h_ * w_) == 0, f"{self.mode} mode needs aligned grids"
            c = q // (h_ * w_)
            v = value.reshape(b, l, h_, w_, m, d)  # S is level-major
            off = offsets.reshape(b, c, h_, w_, m, l, p, 2)
            wgt = weights.reshape(b, c, h_, w_, m, l, p)
            if self.mode == "windowed":
                if self._bev_shards(h_) > 1:
                    from mvdetr_tpu.ops.msda_sharded import bev_row_sharded_windowed_attention

                    out = bev_row_sharded_windowed_attention(
                        v, off, wgt, self.mesh, radius=self.radius, axis="bev"
                    ).reshape(b, c * h_ * w_, m * d)
                else:
                    out = windowed_attention(v, off, wgt, radius=self.radius)
            else:
                # camera query copies share the reference map (`mvdetr.py:129-130`)
                ref_map = reference_points[0].reshape(c, h_ * w_, l, p, 2)[0] \
                    if reference_points.ndim == 5 else \
                    jnp.tile(reference_points[0].reshape(c, h_ * w_, l, 1, 2)[0], (1, 1, p, 1))
                out = ms_deform_attn_warped(v, ref_map, off, wgt, radius=self.radius)
        else:
            locations = ref + offsets / normalizer[None, None, None, :, None, :]
            if len(set(shapes)) == 1:
                out = ms_deform_attn_same_shape(value, shapes[0], len(shapes), locations, weights)
            else:
                out = ms_deform_attn(value, shapes, locations, weights)
        return nn.Dense(self.d_model, kernel_init=xavier_uniform, dtype=self.dtype,
                        name="output_proj")(out)


class DeformableEncoderLayer(nn.Module):
    """Self-attention + FFN with pre-added positional embeds (`deformable_transformer.py:55-85`)."""

    d_model: int = 128
    d_ffn: int = 512
    dropout: float = 0.1
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: object = None
    mode: str = "gather"
    radius: int = 4
    mesh: Optional[object] = None

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, train: bool = True):
        q = src if pos is None else src + pos
        attn = MSDeformAttn(self.d_model, self.n_levels, self.n_heads, self.n_points,
                            dtype=self.dtype, mode=self.mode, radius=self.radius,
                            mesh=self.mesh, name="self_attn")(
            q, reference_points, src, spatial_shapes
        )
        src = src + nn.Dropout(self.dropout, deterministic=not train)(attn)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(src)
        y = nn.Dense(self.d_ffn, kernel_init=xavier_uniform, dtype=self.dtype, name="linear1")(src)
        y = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(y))
        y = nn.Dense(self.d_model, kernel_init=xavier_uniform, dtype=self.dtype, name="linear2")(y)
        src = src + nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(src)


def grid_reference_points(spatial_shapes) -> np.ndarray:
    """Per-level half-center reference grid, normalized (`deformable_transformer.py:29-41`),
    for encoders without a precomputed (geometry-derived) reference map."""
    refs = []
    for h, w in spatial_shapes:
        ys, xs = np.meshgrid(
            np.linspace(0.5, h - 0.5, int(h)) / h, np.linspace(0.5, w - 0.5, int(w)) / w, indexing="ij"
        )
        refs.append(np.stack([xs, ys], -1).reshape(-1, 2))
    ref = np.concatenate(refs, 0)  # [S, 2]
    return np.tile(ref[:, None, :], (1, len(spatial_shapes), 1)).astype(np.float32)  # [S, L, 2]


class DeformableEncoder(nn.Module):
    """Stack of ``num_layers`` deformable encoder layers (`deformable_transformer.py:22-52`).

    ``reference_points`` (static, [Q, L, P, 2]) carries MVDeTr's precomputed
    shadow maps; when None, the standard per-level grid is generated.
    """

    num_layers: int = 3
    d_model: int = 128
    d_ffn: int = 512
    dropout: float = 0.1
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    reference_points: Optional[np.ndarray] = None
    dtype: object = None
    mode: str = "gather"
    radius: int = 4
    mesh: Optional[object] = None

    @nn.compact
    def __call__(self, src, spatial_shapes, pos=None, train: bool = True):
        b = src.shape[0]
        if self.reference_points is None:
            ref = jnp.asarray(grid_reference_points(spatial_shapes))
            ref = jnp.broadcast_to(ref[None], (b,) + ref.shape)
        else:
            ref = jnp.asarray(self.reference_points)
            ref = jnp.broadcast_to(ref[None], (b,) + ref.shape)
        out = src
        for i in range(self.num_layers):
            out = DeformableEncoderLayer(
                self.d_model, self.d_ffn, self.dropout, self.n_levels, self.n_heads, self.n_points,
                dtype=self.dtype, mode=self.mode, radius=self.radius, mesh=self.mesh,
                name=f"layer{i}",
            )(out, pos, ref, spatial_shapes, train)
        return out
