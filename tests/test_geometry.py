"""Geometry unit tests: round-trips and homography vs explicit projection.

The oracle is the reference's math (APD.cu:419-422, 679-739, 467-500): a
plane-induced homography must agree with explicit backproject->intersect->
project for points on the plane.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvpmvs.geometry import (
    Camera, backproject_cam, cam_to_world, depth_from_plane, dist_to_origin,
    homography_terms, plane_from_world, plane_to_world, project,
    random_unit_normals, view_ray,
)
from dvpmvs.geometry.transforms import warp_terms
from dvpmvs.utils.synthetic import make_scene


@pytest.fixture(scope="module")
def two_cams():
    scene = make_scene(num_views=2, height=48, width=64, seed=3)
    return scene.cameras[0], scene.cameras[1]


def test_plane_depth_roundtrip(two_cams):
    ref, _ = two_cams
    key = jax.random.PRNGKey(0)
    x = jnp.array([10.0, 33.0, 60.0])
    y = jnp.array([5.0, 20.0, 40.0])
    depth = jnp.array([2.0, 3.5, 4.2])
    n = random_unit_normals(key, (3,))
    # orient normals toward the camera so planes are non-degenerate
    ray = view_ray(x, y, ref)
    n = jnp.where(jnp.sum(n * ray, axis=-1, keepdims=True) > 0, -n, n)
    w = dist_to_origin(n, x, y, depth, ref)
    plane = jnp.concatenate([n, w[:, None]], axis=-1)
    depth2 = depth_from_plane(plane, x, y, ref)
    np.testing.assert_allclose(depth2, depth, rtol=1e-5)


def test_world_plane_roundtrip(two_cams):
    ref, _ = two_cams
    key = jax.random.PRNGKey(1)
    x = jnp.array([12.0, 50.0])
    y = jnp.array([7.0, 30.0])
    depth = jnp.array([2.5, 3.8])
    n = random_unit_normals(key, (2,))
    ray = view_ray(x, y, ref)
    n = jnp.where(jnp.sum(n * ray, axis=-1, keepdims=True) > 0, -n, n)
    w = dist_to_origin(n, x, y, depth, ref)
    plane = jnp.concatenate([n, w[:, None]], axis=-1)
    world = plane_to_world(plane, x, y, ref)
    back = plane_from_world(world, x, y, ref)
    np.testing.assert_allclose(back, plane, rtol=1e-4, atol=1e-5)


def test_project_backproject_roundtrip(two_cams):
    ref, _ = two_cams
    x = jnp.array([3.0, 40.0, 63.0])
    y = jnp.array([2.0, 25.0, 47.0])
    depth = jnp.array([1.5, 3.0, 5.0])
    Xw = cam_to_world(backproject_cam(x, y, depth, ref), ref)
    pix, d = project(Xw, ref)
    np.testing.assert_allclose(pix[:, 0], x, rtol=1e-4)
    np.testing.assert_allclose(pix[:, 1], y, rtol=1e-4)
    np.testing.assert_allclose(d, depth, rtol=1e-5)


def test_homography_matches_explicit_projection(two_cams):
    """For a point ON the plane, H-warp == backproject+project via the plane."""
    ref, src = two_cams
    key = jax.random.PRNGKey(2)
    x = jnp.array([20.0, 31.0, 44.0])
    y = jnp.array([10.0, 22.0, 41.0])
    depth = jnp.array([2.7, 3.1, 4.0])
    n = random_unit_normals(key, (3,))
    ray = view_ray(x, y, ref)
    n = jnp.where(jnp.sum(n * ray, axis=-1, keepdims=True) > 0, -n, n)
    w = dist_to_origin(n, x, y, depth, ref)
    plane = jnp.concatenate([n, w[:, None]], axis=-1)

    M, b = homography_terms(ref, src)
    u, s, sx, sy = warp_terms(plane, x, y, ref)
    h = jnp.einsum("ij,pj->pi", M, u) - b[None, :] * s[:, None]
    warped = h[:, :2] / h[:, 2:3]

    # explicit: backproject the plane point to world, project into src
    Xw = cam_to_world(backproject_cam(x, y, depth, ref), ref)
    pix, _ = project(Xw, src)
    np.testing.assert_allclose(warped, pix, rtol=1e-3, atol=2e-2)

    # tap-offset linearity: warp of (x+i, y+j) via column terms
    i, j = 3.0, -2.0
    col_x = M[:, 0] / ref.fx - b * sx[0]
    col_y = M[:, 1] / ref.fy - b * sy[0]
    h_tap = h[0] + i * col_x + j * col_y
    warped_tap = h_tap[:2] / h_tap[2]
    d_tap = depth_from_plane(plane[0], x[0] + i, y[0] + j, ref)
    Xw_tap = cam_to_world(backproject_cam(x[0] + i, y[0] + j, d_tap, ref), ref)
    pix_tap, _ = project(Xw_tap, src)
    np.testing.assert_allclose(warped_tap, pix_tap, rtol=1e-3, atol=2e-2)


def test_random_normals_unit_and_hemispheres():
    key = jax.random.PRNGKey(7)
    n = random_unit_normals(key, (1000,))
    norms = jnp.linalg.norm(n, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # roughly isotropic: mean close to zero
    assert float(jnp.abs(jnp.mean(n))) < 0.1


def test_synthetic_scene_photoconsistency():
    """GT depth reprojection: ref pixels land on src pixels with ~equal gray."""
    scene = make_scene(num_views=3, height=64, width=80, seed=1)
    ref, src = scene.cameras[0], scene.cameras[1]
    H, W = scene.images[0].shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    depth = jnp.asarray(scene.gt_depth[0])
    Xw = cam_to_world(backproject_cam(xs, ys, depth, ref), ref)
    pix, sd = project(Xw, src)
    inb = ((pix[..., 0] >= 1) & (pix[..., 0] < W - 1)
           & (pix[..., 1] >= 1) & (pix[..., 1] < H - 1) & (sd > 0))
    xi = jnp.clip(jnp.round(pix[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(pix[..., 1]).astype(jnp.int32), 0, H - 1)
    src_img = jnp.asarray(scene.images[1])
    src_vals = src_img[yi, xi]
    ref_img = jnp.asarray(scene.images[0])
    # Nearest-pixel sampling of a smooth texture: tolerate small error;
    # occlusions are rare in this shallow corner scene.
    diff = jnp.abs(src_vals - ref_img)
    med = float(jnp.median(jnp.where(inb, diff, jnp.nan)[inb]))
    assert med < 12.0, med
