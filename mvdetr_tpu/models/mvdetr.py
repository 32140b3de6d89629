"""MVDeTr — the flagship multiview detector (Flax, NHWC).

Pipeline contract from `/root/reference/multiview_detector/models/mvdetr.py:74-218`:

1. shared backbone over all B*N views (BN statistics over the flattened
   view-batch, `mvdetr.py:153,177`),
2. 1x1 bottleneck to ``bottleneck_dim`` with spatial (2D) dropout,
3. per-view heads: center heatmap / sub-cell offset / bbox size,
4. perspective warp of per-view features onto the reduced BEV grid with the
   per-sample homography ``proj_mats @ inv(M_aug) @ diag(img_reduce)``
   (`mvdetr.py:155-161,194-195`) — the inverse augmentation affine is fused
   into the projection, so view-coherent augmentation holds on device,
5. world-feature fusion (shadow transformer or variants),
6. world heads: BEV occupancy heatmap + offset.

Heads output NHWC maps; callers flatten/gather as needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mvdetr_tpu.models.heads import HEATMAP_BIAS_INIT, OutputHead
from mvdetr_tpu.models.resnet import ResNetFeatures
from mvdetr_tpu.models.vgg import VGG11Features
from mvdetr_tpu.models.world_feat import build_world_feat
from mvdetr_tpu.ops.warp import invert_3x3, perspective_warp


class MVDeTr(nn.Module):
    num_cam: int
    Rworld_shape: Tuple[int, int]
    img_reduce: int = 12
    proj_mats: Optional[np.ndarray] = None  # [N, 3, 3] image px -> reduced BEV grid
    arch: str = "resnet18"
    world_feat_arch: str = "deform_trans"
    bottleneck_dim: int = 128
    outfeat_dim: int = 0
    dropout: float = 0.0
    reference_points: Optional[np.ndarray] = None  # [N*Hs*Ws, N, P, 2] for deform_trans
    n_points: int = 4
    compute_dtype: object = None  # e.g. jnp.bfloat16; params and losses stay f32
    attn_mode: str = "auto"  # deformable sampling: 'auto' | 'gather' | 'windowed' | 'warped'
    attn_radius: int = 4
    remat_backbone: bool = False  # rematerialize backbone blocks (HBM for FLOPs)
    # BEV-warp sampling convention. 'center' (default): destination cells
    # sample the source at exact integer-center pixel coords. 'kornia':
    # reproduce the reference's `kornia.warp_perspective(..,
    # align_corners=False)` quirk (`mvdetr.py:194`) — kornia normalizes pixel
    # coords corner-aligned by (W-1) but grid-samples edge-aligned by W, so
    # the effective source coordinate is x*W/(W-1) - 0.5. Needed for
    # bit-faithful eval of converted reference checkpoints (interop.py); the
    # correction folds into the 3x3 projection, costing nothing.
    warp_convention: str = "center"
    # Optional jax.sharding.Mesh: states the SPMD strategy explicitly — the
    # per-view stack is constrained to P(('data','view')) so backbone + warp
    # stay shard-local, and the warped BEV stack to P('data','view') so the
    # encoder's value all-gather is the stated (and only) view collective.
    mesh: Optional[object] = None

    @classmethod
    def from_rig(
        cls,
        rig,
        world_reduce: int = 4,
        img_reduce: int = 12,
        arch: str = "resnet18",
        world_feat_arch: str = "deform_trans",
        bottleneck_dim: int = 128,
        outfeat_dim: int = 0,
        dropout: float = 0.0,
        n_points: int = 4,
        compute_dtype=None,
        attn_mode: str = "auto",
        attn_radius: int = 4,
        remat_backbone: bool = False,
        mesh=None,
        warp_convention: str = "center",
    ) -> "MVDeTr":
        """Build from a :class:`CameraRig`, deriving projection matrices and
        reference maps (`mvdetr.py:82-95,129-130`)."""
        ref = None
        if world_feat_arch == "deform_trans":
            ref = rig.reference_points(world_reduce=world_reduce, downsample=2, n_points=n_points)
            ref = np.tile(ref, (rig.num_cam, 1, 1, 1))  # queries repeated per camera
            if n_points == 4 and attn_mode != "gather":
                # geometry-aware clamp-safety check (BENCH_NOTES clamp-stress
                # table): on long-shadow rigs the windowed radius starves
                # 4-point attention; 8-point shadow refs absorb the reach on
                # the same Pallas fast path.
                med, p95 = rig.shadow_reach_cells(world_reduce=world_reduce, downsample=2)
                if med > max(15 * attn_radius, 60):
                    import warnings

                    msg = (
                        f"rig '{rig.name}': median shadow reach {med:.0f} cells "
                        f"(p95 {p95:.0f}) far exceeds the windowed attention radius "
                        f"{attn_radius} at n_points=4 — long-shadow (low-camera) rigs "
                        f"lose accuracy under the clamp. Use --n_points 8 (shadow "
                        f"reference maps, same fast path) or --attn_mode gather; "
                        f"watch the offset_clip_fraction train log."
                    )
                    warnings.warn(msg)
                    print(f"WARNING: {msg}")
        return cls(
            num_cam=rig.num_cam,
            Rworld_shape=rig.Rworld_shape(world_reduce),
            img_reduce=img_reduce,
            proj_mats=rig.proj_mats(world_reduce=world_reduce).astype(np.float32),
            arch=arch,
            world_feat_arch=world_feat_arch,
            bottleneck_dim=bottleneck_dim,
            outfeat_dim=outfeat_dim,
            dropout=dropout,
            reference_points=ref,
            n_points=n_points,
            compute_dtype=compute_dtype,
            attn_mode=attn_mode,
            attn_radius=attn_radius,
            remat_backbone=remat_backbone,
            mesh=mesh,
            warp_convention=warp_convention,
        )

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, affine_mats: jnp.ndarray, train: bool = True):
        """``imgs``: [B, N, H, W, 3] normalized; ``affine_mats``: [B, N, 3, 3]
        augmentation affines in full-resolution image pixels (identity when
        augmentation is off)."""
        b, n, h, w, _ = imgs.shape
        assert n == self.num_cam
        x = imgs.reshape(b * n, h, w, 3)
        if x.dtype == jnp.uint8:
            # uint8 transport + on-chip ImageNet normalization (the host
            # pipeline ships raw resized pixels; `data/dataset.py:118-124`)
            dt = self.compute_dtype or jnp.float32
            mean = jnp.asarray([0.485, 0.456, 0.406], dt) * 255.0
            std = jnp.asarray([0.229, 0.224, 0.225], dt) * 255.0
            x = (x.astype(dt) - mean) / std
        x = self._constrain(x, (b, n), ("data", "view"), fused=True)

        # backbone params live under params['base'] — the boundary the
        # two-group optimizer keys on (`main.py:100-104`)
        if self.arch == "resnet18":
            feat = ResNetFeatures(
                stage_sizes=(2, 2, 2, 2), replace_stride_with_dilation=(False, True, True),
                dtype=self.compute_dtype, remat=self.remat_backbone, name="base"
            )(x, train)
        elif self.arch == "vgg11":
            feat = VGG11Features(name="base")(x, train)
        else:
            raise ValueError(f"unsupported arch: {self.arch}")

        if self.bottleneck_dim:
            feat = nn.Conv(self.bottleneck_dim, (1, 1), dtype=self.compute_dtype, name="bottleneck")(feat)
            # Dropout2d: drop whole channels across space (`mvdetr.py:110`)
            feat = nn.Dropout(self.dropout, broadcast_dims=(1, 2), deterministic=not train)(feat)

        # per-view heads on the [B*N, Hf, Wf, C] maps
        imgs_heatmap = OutputHead(1, self.outfeat_dim, HEATMAP_BIAS_INIT, dtype=self.compute_dtype,
                                  name="img_heatmap")(feat)
        imgs_offset = OutputHead(2, self.outfeat_dim, dtype=self.compute_dtype, name="img_offset")(feat)
        imgs_wh = OutputHead(2, self.outfeat_dim, dtype=self.compute_dtype, name="img_wh")(feat)

        # projection: feature grid -> image px (x img_reduce) -> un-augment -> BEV
        proj = jnp.asarray(self.proj_mats, dtype=jnp.float32)  # [N, 3, 3]
        inv_aff = invert_3x3(affine_mats.reshape(b * n, 3, 3).astype(jnp.float32))
        reduce_mat = jnp.diag(jnp.asarray([self.img_reduce, self.img_reduce, 1.0], dtype=jnp.float32))
        full_proj = jnp.einsum(
            "sij,sjk,kl->sil", jnp.tile(proj, (b, 1, 1)), inv_aff, reduce_mat
        )  # [B*N, 3, 3] feature px -> BEV cell
        if self.warp_convention == "kornia":
            # fold the kornia align_corners=False resampling quirk (see class
            # docstring) into the homography: x' = x*W/(W-1) - 0.5 on the
            # source side, so mats' = mats @ inv(S)
            hf, wf = feat.shape[1], feat.shape[2]
            inv_s = jnp.asarray(
                [
                    [(wf - 1) / wf, 0.0, 0.5 * (wf - 1) / wf],
                    [0.0, (hf - 1) / hf, 0.5 * (hf - 1) / hf],
                    [0.0, 0.0, 1.0],
                ],
                dtype=jnp.float32,
            )
            full_proj = full_proj @ inv_s
        elif self.warp_convention != "center":
            raise ValueError(f"unknown warp_convention: {self.warp_convention}")

        world_in = perspective_warp(feat, full_proj, self.Rworld_shape)
        c = world_in.shape[-1]
        world_in = world_in.reshape(b, n, self.Rworld_shape[0], self.Rworld_shape[1], c)
        world_in = self._constrain(world_in, (b, n), ("data", "view"))
        # per-stage feature dumps (`mvdetr.py:163-175,196-201` visualize=True
        # parity) — dead code under jit unless mutable=["intermediates"]
        self.sow("intermediates", "viz_img_featmap", feat)
        self.sow("intermediates", "viz_world_inputs", world_in)

        world_feat = build_world_feat(
            self.world_feat_arch,
            self.num_cam,
            self.Rworld_shape,
            base_dim=self.bottleneck_dim or 512,
            reference_points=self.reference_points,
            n_points=self.n_points,
            dtype=self.compute_dtype,
            attn_mode=self.attn_mode,
            attn_radius=self.attn_radius,
            mesh=self.mesh,
        )(world_in, train)

        self.sow("intermediates", "viz_world_feature", world_feat)  # `mvdetr.py:209-217`
        world_heatmap = OutputHead(1, self.outfeat_dim, HEATMAP_BIAS_INIT, dtype=self.compute_dtype,
                                   name="world_heatmap")(world_feat)
        world_offset = OutputHead(2, self.outfeat_dim, dtype=self.compute_dtype, name="world_offset")(world_feat)

        return (world_heatmap, world_offset), (imgs_heatmap, imgs_offset, imgs_wh)

    def _constrain(self, x, dims, axes, fused: bool = False):
        """``with_sharding_constraint`` against ``self.mesh`` (no-op without a
        mesh, or when ``dims`` don't divide the mesh — e.g. the batch-1 init
        trace). ``fused=True`` means axis 0 carries the flattened (batch,
        view) product — sharded over both mesh axes jointly."""
        if self.mesh is None:
            return x
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        sizes = dict(self.mesh.shape)
        names = [a if a in sizes and d % sizes[a] == 0 else None for d, a in zip(dims, axes)]
        if not any(names):
            return x
        if fused:
            if None in names:
                return x
            spec = PartitionSpec(tuple(names))
        else:
            spec = PartitionSpec(*names)
        return jax.lax.with_sharding_constraint(x, NamedSharding(self.mesh, spec))
