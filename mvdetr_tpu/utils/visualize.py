"""Offline visualization tools.

Equivalents of the reference's root-level scripts (SURVEY §2.7):

- :func:`grid_overlay`  — warp raw images to BEV and draw grid lines both ways
  to eyeball homography consistency (`grid_visualize.py`),
- :func:`shadow_points` — paint deformable sampling locations per camera in
  BEV and back-projected into images (`deform_visualize.py`, the paper's
  "shadow" figures),
- :func:`detection_video_frames` — render detections as per-camera boxes from
  a results file (`video_visualize.py`).

All functions return numpy images (H, W, 3) uint8; saving/plotting is left to
the caller.
"""

from __future__ import annotations

import numpy as np

from mvdetr_tpu.geometry.projection import project_points
from mvdetr_tpu.geometry.rig import CameraRig


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, dtype=np.float64)
    img = (img - img.min()) / (img.max() - img.min() + 1e-8)
    return (img * 255).astype(np.uint8)


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406])
IMAGENET_STD = np.array([0.229, 0.224, 0.225])


def denormalize_image(img: np.ndarray) -> np.ndarray:
    """Undo ImageNet normalization, NHWC [..., 3] -> uint8
    (`utils/image_utils.py:114-120` equivalent)."""
    out = np.asarray(img) * IMAGENET_STD + IMAGENET_MEAN
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)


def heatmap_overlay(heatmap: np.ndarray, image: np.ndarray, alpha: float = 0.4) -> np.ndarray:
    """Burn a [H, W] heatmap into an image as a red overlay
    (`utils/image_utils.py:123-136` equivalent, colormap-free)."""
    hm = np.asarray(heatmap, dtype=np.float64)
    hm = (hm - hm.min()) / (hm.max() - hm.min() + 1e-8)
    h, w = image.shape[:2]
    if hm.shape != (h, w):
        hm = warp_image_np(hm[..., None], np.diag([w / hm.shape[1], h / hm.shape[0], 1.0]), (h, w))[..., 0]
    out = np.asarray(image, dtype=np.float64).copy()
    out[..., 0] = out[..., 0] * (1 - alpha) + 255 * hm * alpha
    return np.clip(out, 0, 255).astype(np.uint8)


def warp_image_np(img: np.ndarray, mat: np.ndarray, out_shape) -> np.ndarray:
    """Host-side perspective warp (src->dst matrix), bilinear, zeros padding."""
    ho, wo = (int(v) for v in out_shape)
    inv = np.linalg.inv(mat)
    ys, xs = np.meshgrid(np.arange(ho, dtype=np.float64), np.arange(wo, dtype=np.float64), indexing="ij")
    pts = np.stack([xs, ys, np.ones_like(xs)], -1) @ inv.T
    sx = pts[..., 0] / pts[..., 2]
    sy = pts[..., 1] / pts[..., 2]
    h, w = img.shape[:2]
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    out = np.zeros((ho, wo) + img.shape[2:], dtype=np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            xi, yi = x0 + dx, y0 + dy
            inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            wgt = (1 - np.abs(sx - xi)) * (1 - np.abs(sy - yi)) * inb
            out += img[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)] * wgt[..., None]
    return out


def grid_overlay(rig: CameraRig, images, world_reduce: int = 4, grid_step: int = 20) -> list:
    """Per-camera BEV projections of raw images with grid lines burned in."""
    out_shape = rig.Rworld_shape(world_reduce)
    mats = rig.proj_mats(world_reduce=world_reduce)
    scale = np.diag([1.0, 1.0, 1.0])
    results = []
    for cam, img in enumerate(images):
        h, w = img.shape[:2]
        sy = rig.img_shape[0] / h
        mat = mats[cam] @ np.diag([sy, sy, 1.0]) @ scale  # handle resized inputs
        bev = warp_image_np(np.asarray(img, dtype=np.float64), mat, out_shape)
        bev = _to_uint8(bev)
        bev[::grid_step, :, :] = [0, 255, 0]
        bev[:, ::grid_step, :] = [0, 255, 0]
        results.append(bev)
    return results


def shadow_points(
    rig: CameraRig,
    sampling_locations: np.ndarray,  # [Q, M, L, P, 2] normalized, one query's or many
    attention_weights: np.ndarray,  # [Q, M, L, P]
    query_cells,  # iterable of (x, y) BEV cells the queries correspond to
    world_reduce: int = 4,
    downsample: int = 2,
):
    """BEV scatter data of attended points per camera: returns a dict
    cam -> (points [K, 2] in BEV cells, weights [K]).

    The caller overlays these on a BEV heatmap; back-projection into images
    goes through ``rig.img_from_world``.
    """
    hs, ws = (v // downsample for v in rig.Rworld_shape(world_reduce))
    out = {}
    q, m, l, p, _ = sampling_locations.shape
    for cam in range(l):
        pts = sampling_locations[:, :, cam, :, :].reshape(-1, 2) * np.array([ws, hs]) * downsample
        wts = attention_weights[:, :, cam, :].reshape(-1)
        out[cam] = (pts, wts)
    return out


def capture_attention(state, batch):
    """Forward pass capturing the deformable-attention internals the shadow
    figures need (`deform_visualize.py:44-139` inputs; the reference dumps
    them from forward under ``visualize=True``, `mvdetr.py:163-175`).

    Returns (outputs, layers) where ``layers`` is a list over encoder layers
    of dicts with ``sampling_locations [B, Q, M, L, P, 2]`` (normalized) and
    ``attention_weights [B, Q, M, L, P]`` numpy arrays.
    """
    outputs, mods = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["imgs"], batch["affine_mats"], train=False, mutable=["intermediates"],
    )
    inter = mods.get("intermediates", {})

    found = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        else:  # sow stores a tuple of values
            if path[-1] in ("viz_sampling_locations", "viz_attention_weights"):
                layer = next((p for p in path if p.startswith("layer")), "layer0")
                key = path[-1].replace("viz_", "")
                found.setdefault(layer, {})[key] = np.asarray(tree[0])

    walk(inter, ())
    layers = [found[k] for k in sorted(found)]
    return outputs, layers


def shadow_backprojected(
    rig: CameraRig,
    sampling_locations: np.ndarray,  # [Q, M, L, P, 2] normalized (one batch item)
    attention_weights: np.ndarray,  # [Q, M, L, P]
    query_index: int,
    world_reduce: int = 4,
    downsample: int = 2,
):
    """Back-project one query's attended points into every camera image.

    Returns (bev_pts, per_cam) where ``bev_pts[cam] = (pts [M*P, 2] in
    downsampled BEV cells, weights [M*P])`` and ``per_cam[cam] = (image-plane
    points [M*P, 2] at z=0, weights)`` — the data behind the paper's shadow
    figures (`deform_visualize.py:44-139`).
    """
    loc = np.asarray(sampling_locations)[query_index]  # [M, L, P, 2]
    wgt = np.asarray(attention_weights)[query_index]  # [M, L, P]
    hs, ws = (v // downsample for v in rig.Rworld_shape(world_reduce))
    grid_from_coord = rig.Rworldgrid_from_worldcoord_mat(world_reduce, downsample)
    coord_from_grid = np.linalg.inv(grid_from_coord)
    bev, cams = {}, {}
    for cam in range(loc.shape[1]):
        pts_grid = loc[:, cam].reshape(-1, 2) * np.array([ws, hs])  # xy cells
        weights = wgt[:, cam].reshape(-1)
        wc = project_points(coord_from_grid, pts_grid)
        img_pts = project_points(rig.imgcoord_from_worldcoord_mat(cam, 0.0), wc)
        bev[cam] = (pts_grid, weights)
        cams[cam] = (img_pts, weights)
    return bev, cams


def detection_video_frames(rig: CameraRig, det_rows: np.ndarray, images_by_frame, box_wh_m=(0.5, 1.8)):
    """Overlay detections (frame, x, y in native grid) as boxes on each camera.

    ``images_by_frame``: mapping frame -> list of per-camera images. Returns
    mapping frame -> list of overlaid images.
    """
    out = {}
    half_w = box_wh_m[0] / 2 / rig.worldcoord_unit
    for frame, imgs in images_by_frame.items():
        rows = det_rows[det_rows[:, 0] == frame]
        drawn = []
        for cam, img in enumerate(imgs):
            img = np.array(img, dtype=np.uint8).copy()
            h, w = img.shape[:2]
            sx = w / rig.img_shape[1]
            sy = h / rig.img_shape[0]
            for _, gx, gy in rows:
                wc = rig.worldcoord_from_worldgrid(np.array([[gx, gy]]))[0]
                foot = project_points(rig.imgcoord_from_worldcoord_mat(cam, 0.0), wc[None])[0]
                head = project_points(rig.imgcoord_from_worldcoord_mat(cam, box_wh_m[1]), wc[None])[0]
                side = project_points(rig.imgcoord_from_worldcoord_mat(cam, 0.0), (wc + [half_w, 0])[None])[0]
                bw = abs(side[0] - foot[0])
                x1, x2 = int((foot[0] - bw) * sx), int((foot[0] + bw) * sx)
                y1, y2 = int(head[1] * sy), int(foot[1] * sy)
                if x2 < 0 or x1 >= w or y2 < 0 or y1 >= h:
                    continue
                x1, x2 = np.clip([x1, x2], 0, w - 1)
                y1, y2 = np.clip([y1, y2], 0, h - 1)
                img[y1:y2 + 1, [x1, x2]] = [0, 255, 0]
                img[[y1, y2], x1:x2 + 1] = [0, 255, 0]
            drawn.append(img)
        out[frame] = drawn
    return out


def capture_forward_stages(state, batch):
    """Forward pass capturing the per-stage feature maps the reference dumps
    under ``visualize=True`` (`mvdetr.py:163-175,196-201,209-217`): the
    per-view backbone/bottleneck map, the warped BEV inputs, and the fused
    world feature. Returns (outputs, {name: np.ndarray})."""
    outputs, mods = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["imgs"], batch["affine_mats"], train=False, mutable=["intermediates"],
    )
    inter = mods.get("intermediates", {})
    stages = {}
    for name in ("viz_img_featmap", "viz_world_inputs", "viz_world_feature"):
        if name in inter:
            stages[name.replace("viz_", "")] = np.asarray(inter[name][0], dtype=np.float32)
    return outputs, stages


def save_forward_stage_figures(state, batch, out_dir: str) -> list:
    """Write the per-stage channel-norm figures (`--visualize` parity with the
    reference's in-forward imshow dumps). Returns the written paths."""
    import os

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return []
    os.makedirs(out_dir, exist_ok=True)
    _, stages = capture_forward_stages(state, batch)
    paths = []

    def norm(x):  # channel L2 as the displayed intensity (`torch.norm(dim=1)`)
        return np.linalg.norm(x, axis=-1)

    if "img_featmap" in stages:
        fm = stages["img_featmap"]  # [B*N, Hf, Wf, C]
        fig, ax = plt.subplots()
        ax.imshow(norm(fm[0]))
        ax.set_title("cam1 bottleneck feature (channel norm)")
        paths.append(os.path.join(out_dir, "stage_img_featmap.jpg"))
        fig.savefig(paths[-1]); plt.close(fig)
    if "world_inputs" in stages:
        wi = stages["world_inputs"]  # [B, N, Hw, Ww, C]
        n = wi.shape[1]
        fig, axes = plt.subplots(n, 1, figsize=(8, 2 * n))
        for cam in range(n):
            ax = axes[cam] if n > 1 else axes
            ax.imshow(norm(wi[0, cam]))
            ax.set_axis_off()
        fig.suptitle("warped per-camera BEV inputs (channel norm)")
        paths.append(os.path.join(out_dir, "stage_world_inputs.jpg"))
        fig.savefig(paths[-1]); plt.close(fig)
    if "world_feature" in stages:
        fig, ax = plt.subplots(figsize=(10, 4))
        ax.imshow(norm(stages["world_feature"][0]))
        ax.set_title("fused world feature (channel norm)")
        paths.append(os.path.join(out_dir, "stage_world_feature.jpg"))
        fig.savefig(paths[-1]); plt.close(fig)
    return paths
