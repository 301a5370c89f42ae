"""Pure-jnp projective geometry.

Formulas mirror the reference device helpers (behavioral oracle, not a code
port):
  * depth<->plane:  ComputeDepthfromPlaneHypothesis  APD.cu:419-422,
                    GetDistance2Origin               APD.cu:400-405
  * projections:    Get3DPointonWorld_cu             APD.cu:467-487,
                    ProjectonCamera_cu               APD.cu:489-500
  * homography:     ComputeHomography                APD.cu:679-739
  * view direction: GetViewDirection                 APD.cu:386-398

A plane hypothesis is (nx, ny, nz, w): unit normal in the *reference camera
frame* plus the plane's signed distance to the camera origin
(w = -n . X_cam).  The "world form" used for persistence swaps in the world
normal and per-pixel depth (reference GetDepthandNormal, APD.cu:3167-3182).

All functions broadcast over arbitrary leading pixel dims; intrinsics are
assumed skew-free (as the reference's unrolled K-inverse does).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .camera import Camera


def view_ray(x, y, cam: Camera, normalize: bool = True) -> jnp.ndarray:
    """Camera-frame ray through pixel (x, y): ((x-cx)/fx, (y-cy)/fy, 1).

    With ``normalize`` this equals the reference ``GetViewDirection`` (the
    depth scaling there cancels in the normalization).
    Returns [..., 3].
    """
    rx = (x - cam.cx) / cam.fx
    ry = (y - cam.cy) / cam.fy
    ray = jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)
    if normalize:
        ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    return ray


def depth_from_plane(plane: jnp.ndarray, x, y, cam: Camera) -> jnp.ndarray:
    """Depth of the plane (n, w) along the ray of pixel (x, y).

    depth = -w / (n . u) with u the unnormalized ray.
    """
    n = plane[..., :3]
    w = plane[..., 3]
    rx = (x - cam.cx) / cam.fx
    ry = (y - cam.cy) / cam.fy
    denom = n[..., 0] * rx + n[..., 1] * ry + n[..., 2]
    return -w / denom


def dist_to_origin(normal: jnp.ndarray, x, y, depth, cam: Camera) -> jnp.ndarray:
    """Signed plane distance w = -(n . X_cam) for X_cam = depth * u."""
    rx = (x - cam.cx) / cam.fx
    ry = (y - cam.cy) / cam.fy
    ndotu = normal[..., 0] * rx + normal[..., 1] * ry + normal[..., 2]
    return -depth * ndotu


def backproject_cam(x, y, depth, cam: Camera) -> jnp.ndarray:
    """Pixel + depth -> camera-frame 3D point ([..., 3])."""
    px = depth * (x - cam.cx) / cam.fx
    py = depth * (y - cam.cy) / cam.fy
    return jnp.stack([px, py, depth], axis=-1)


def cam_to_world(X_cam: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """Camera-frame point -> world: X = R^T X_cam + c."""
    return jnp.einsum("...ji,...j->...i", cam.R, X_cam) + cam.c


def world_to_cam_point(X_world: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    return jnp.einsum("...ij,...j->...i", cam.R, X_world) + cam.t


def project(X_world: jnp.ndarray, cam: Camera) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World point -> (pixel xy [..., 2], depth)."""
    xc = world_to_cam_point(X_world, cam)
    h = jnp.einsum("...ij,...j->...i", cam.K, xc)
    depth = h[..., 2]
    return h[..., :2] / depth[..., None], depth


def plane_to_world(plane: jnp.ndarray, x, y, ref: Camera) -> jnp.ndarray:
    """(n_ref, w) -> (n_world, depth) persistence form."""
    n_world = jnp.einsum("ji,...j->...i", ref.R, plane[..., :3])
    depth = depth_from_plane(plane, x, y, ref)
    return jnp.concatenate([n_world, depth[..., None]], axis=-1)


def plane_from_world(world_plane: jnp.ndarray, x, y, ref: Camera) -> jnp.ndarray:
    """(n_world, depth) -> (n_ref, w) compute form."""
    n_ref = jnp.einsum("ij,...j->...i", ref.R, world_plane[..., :3])
    w = dist_to_origin(n_ref, x, y, world_plane[..., 3], ref)
    return jnp.concatenate([n_ref, w[..., None]], axis=-1)


def relative_pose(ref: Camera, src: Camera) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """R_rel = R_src R_ref^T,  t_rel = R_src (C_ref - C_src).

    ``src`` may carry a leading view axis.
    """
    R_rel = jnp.einsum("...ik,jk->...ij", src.R, ref.R)
    t_rel = jnp.einsum("...ij,...j->...i", src.R, ref.c - src.c)
    return R_rel, t_rel


def homography_terms(ref: Camera, src: Camera) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-view constants of the plane-induced homography.

    H = K_src (R_rel - t_rel n^T / w) K_ref^{-1}; factored as
    H u = M u - b (n . K_ref^{-1} u)/w  with  M = K_src R_rel,  b = K_src t_rel
    (u already premultiplied by K_ref^{-1}).  Returns (M [..., 3, 3],
    b [..., 3]).
    """
    R_rel, t_rel = relative_pose(ref, src)
    M = jnp.einsum("...ij,...jk->...ik", src.K, R_rel)
    b = jnp.einsum("...ij,...j->...i", src.K, t_rel)
    return M, b


def warp_terms(plane: jnp.ndarray, x, y, cam: Camera):
    """Per-pixel pieces of the homography warp for a plane hypothesis.

    Returns (u, s, sx, sy):
      u  [..., 3]  = K_ref^{-1} [x, y, 1]
      s  [...]     = (n . u) / w
      sx [...]     = nx / (fx w);  sy = ny / (fy w)
    so that warped(p + (i, j)) = proj(M u - b s + i (M e0 / fx - b sx)
                                               + j (M e1 / fy - b sy)).
    """
    n = plane[..., :3]
    w = plane[..., 3]
    rx = (x - cam.cx) / cam.fx
    ry = (y - cam.cy) / cam.fy
    u = jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)
    s = (n[..., 0] * rx + n[..., 1] * ry + n[..., 2]) / w
    sx = n[..., 0] / (cam.fx * w)
    sy = n[..., 1] / (cam.fy * w)
    return u, s, sx, sy


def random_unit_normals(key: jax.Array, shape) -> jnp.ndarray:
    """Uniform unit normals via the spherical construction -> [*shape, 3].

    Same distribution as the reference's Marsaglia rejection sampler
    (APD.cu:560-575) with no rejection loop: z ~ U(-1,1), phi ~ U(0,2pi),
    n = (r cos phi, r sin phi, z), r = sqrt(1-z^2) — exactly unit and
    branch-free (the rejection select needed a take_along_axis, which
    lowers to a pathologically slow gather on TPU).
    """
    kz, kp = jax.random.split(key)
    z = jax.random.uniform(kz, shape, minval=-1.0, maxval=1.0)
    phi = jax.random.uniform(kp, shape, minval=0.0, maxval=2.0 * jnp.pi)
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
