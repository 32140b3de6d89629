"""Geometry core tests.

Mirrors the reference's reprojection self-tests (`datasets/Wildtrack.py:121-145`)
on synthetic rigs with known geometry: project ground points into cameras and
back, verify homography composition and reference-map identities.
"""

import numpy as np
import pytest

from mvdetr_tpu.geometry import (
    CameraRig,
    make_synthetic_rig,
    make_wildtrack_like_rig,
    plane_homography,
    project_points,
    rodrigues,
)


def _grid_points(rig: CameraRig, n=200, seed=0):
    r = np.random.default_rng(seed)
    H, W = rig.worldgrid_shape
    if rig.indexing == "xy":
        x = r.uniform(0, W, n)
        y = r.uniform(0, H, n)
    else:
        x = r.uniform(0, H, n)
        y = r.uniform(0, W, n)
    return np.stack([x, y], axis=-1)


def test_rodrigues_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    r = np.random.default_rng(0)
    for _ in range(10):
        rvec = r.normal(size=3)
        ours = rodrigues(rvec)
        theirs, _ = cv2.Rodrigues(rvec)
        np.testing.assert_allclose(ours, theirs, atol=1e-10)


@pytest.mark.parametrize("rig_kind", ["xy", "ij"])
def test_image_world_roundtrip(rig_kind, small_rig, wildtrack_like_rig):
    rig = small_rig if rig_kind == "xy" else wildtrack_like_rig
    pts_grid = _grid_points(rig)
    pts_world = rig.worldcoord_from_worldgrid(pts_grid)
    for cam in range(rig.num_cam):
        img = project_points(rig.imgcoord_from_worldcoord_mat(cam), pts_world)
        back = project_points(rig.worldcoord_from_imgcoord_mat(cam), img)
        np.testing.assert_allclose(back, pts_world, atol=1e-6)


def test_elevated_point_projects_inside_shadow():
    """A point at z>0 reprojected at z=0 lands farther from the camera along its ray."""
    rig = make_synthetic_rig(num_cam=2, img_shape=(96, 160), worldgrid_shape=(48, 96))
    cam = 0
    cam_center = -rig.extrinsic_matrices[cam][:, :3].T @ rig.extrinsic_matrices[cam][:, 3]
    world_pt = np.array([[1.5, 1.0]])
    img_of_head = project_points(rig.imgcoord_from_worldcoord_mat(cam, z_meters=1.8), world_pt)
    shadow = project_points(rig.worldcoord_from_imgcoord_mat(cam, z_meters=0.0), img_of_head)
    d_pt = np.linalg.norm(world_pt[0] - cam_center[:2])
    d_shadow = np.linalg.norm(shadow[0] - cam_center[:2])
    assert d_shadow > d_pt  # the ground shadow of an elevated point is pushed away


@pytest.mark.parametrize("rig_kind", ["xy", "ij"])
def test_proj_mats_composition(rig_kind, small_rig, wildtrack_like_rig):
    """proj_mats = Rworldgrid_from_worldcoord @ worldcoord_from_imgcoord (mvdetr.py:82-95)."""
    rig = small_rig if rig_kind == "xy" else wildtrack_like_rig
    reduce = 4
    proj = rig.proj_mats(world_reduce=reduce)
    pts_grid = _grid_points(rig)
    pts_world = rig.worldcoord_from_worldgrid(pts_grid)
    # xy-indexed reduced grid coordinates of the same points:
    xy = project_points(rig.Rworldgrid_from_worldcoord_mat(reduce), pts_world)
    for cam in range(rig.num_cam):
        img = project_points(rig.imgcoord_from_worldcoord_mat(cam), pts_world)
        out = project_points(proj[cam], img)
        np.testing.assert_allclose(out, xy, atol=1e-5)
    # and under ij indexing the x axis of the grid must be the row axis
    if rig.indexing == "ij":
        np.testing.assert_allclose(xy[:, 0], pts_grid[:, 1] / reduce, atol=1e-6)
        np.testing.assert_allclose(xy[:, 1], pts_grid[:, 0] / reduce, atol=1e-6)


def test_world_img_inverses(small_rig):
    w2i, i2w = small_rig.img_from_world(), small_rig.world_from_img()
    for cam in range(small_rig.num_cam):
        np.testing.assert_allclose(w2i[cam] @ i2w[cam], np.eye(3), atol=1e-8)


@pytest.mark.parametrize("rig_kind", ["xy", "ij"])
def test_reference_points_identity_at_z0(rig_kind, small_rig, wildtrack_like_rig):
    """With n_points=4 (all z=0) the reference map is the identity grid (mvdetr.py:39-40)."""
    rig = small_rig if rig_kind == "xy" else wildtrack_like_rig
    ref = rig.reference_points(world_reduce=4, downsample=2, n_points=4)
    H, W = rig.Rworld_shape(4)
    H, W = H // 2, W // 2
    assert ref.shape == (H * W, rig.num_cam, 4, 2)
    ys, xs = np.meshgrid(np.linspace(0.5, H - 0.5, H), np.linspace(0.5, W - 0.5, W), indexing="ij")
    expect = np.stack([xs / W, ys / H], axis=-1).reshape(-1, 2)
    for cam in range(rig.num_cam):
        for p in range(4):
            np.testing.assert_allclose(ref[:, cam, p], expect, atol=1e-4)


def test_reference_points_8_shadow_direction(small_rig):
    """8-point maps trace each camera's shadow ray: higher z moves the point away from the camera."""
    rig = small_rig
    ref = rig.reference_points(world_reduce=4, downsample=2, n_points=8)
    H, W = rig.Rworld_shape(4)
    H, W = H // 2, W // 2
    for cam in range(rig.num_cam):
        cam_center = -rig.extrinsic_matrices[cam][:, :3].T @ rig.extrinsic_matrices[cam][:, 3]
        # camera center in normalized reduced-grid coords
        cgrid = project_points(rig.Rworldgrid_from_worldcoord_mat(4, 2), cam_center[:2][None])
        cnorm = cgrid[0] / np.array([W, H])
        p_z0 = ref[:, cam, 2]  # z = 0
        p_z18 = ref[:, cam, 7]  # z = 1.8m
        d0 = np.linalg.norm(p_z0 - cnorm, axis=-1)
        d18 = np.linalg.norm(p_z18 - cnorm, axis=-1)
        frac_far = np.mean(d18 > d0)
        assert frac_far > 0.99, f"cam {cam}: shadow of z=1.8m not pushed away ({frac_far:.2%})"


def test_pos_encoding_roundtrip(small_rig, wildtrack_like_rig):
    for rig in (small_rig, wildtrack_like_rig):
        pos = np.arange(0, np.prod(rig.worldgrid_shape), 7)
        grid = rig.worldgrid_from_pos(pos)
        np.testing.assert_array_equal(rig.pos_from_worldgrid(grid), pos)


def test_plane_homography_shape():
    K = np.eye(3)
    E = np.hstack([np.eye(3), np.array([[0.0], [0.0], [5.0]])])
    h = plane_homography(K, E, z=2.0)
    assert h.shape == (3, 3)
    # a point at origin on plane z=2 maps through [R|t] to (0,0,7) -> pixel (0,0)
    np.testing.assert_allclose(project_points(h, np.array([[0.0, 0.0]])), [[0.0, 0.0]], atol=1e-12)
