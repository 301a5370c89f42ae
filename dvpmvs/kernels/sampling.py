"""Hypothesis sampling: visibility-prior random normals, perturbations,
random depths.

Oracles:
  * ``GenerateRandomNormal_YZL`` (APD.cu:501-588): rejection-sample unit
    normals until the normal faces away from the reference ray AND the rays
    of every selected source view (rotated into the ref frame).  The serial
    200-try loop becomes S parallel candidates + first-valid select; the
    fallback flips the first candidate against the reference ray.
    (The reference's ``dir = {x, y, x}`` component typo is NOT reproduced.)
  * ``GeneratePerturbedNormal`` (APD.cu:617-661): small Euler-angle rotation
    with a view-facing check.  The reference discards the perturbation on
    both branches (quirk Q3, SURVEY §2.5); here the perturbation is real.
  * ``GenerateRandomPlaneHypothesis_YZL`` (APD.cu:663-670).

RNG is counter-based ``jax.random`` keyed by (pass, iteration, color, site)
so runs are reproducible (the reference seeds curand with clock64()).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.camera import Camera
from ..geometry.transforms import dist_to_origin, random_unit_normals


def _normalize(v, axis=-1):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), 1e-12)


def view_direction_set(
    depth: jnp.ndarray,           # [H, W]
    sel_views: jnp.ndarray,       # [H, W, V] bool
    rx: jnp.ndarray, ry: jnp.ndarray,   # [H, W] ref-cam normalized plane coords
    ref_cam: Camera, src_cams: Camera,
):
    """Per-pixel direction set for the visibility prior.

    Returns (dirs [H, W, V+1, 3], active [H, W, V+1]): slot 0 is the ref ray,
    slots 1..V the selected source-view rays expressed in the ref frame.
    Directions are depth-independent up to the projection point (the
    reference's GetViewDirection normalizes away the depth scale).
    """
    H, W = depth.shape
    ray_ref = _normalize(jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1))

    # project each pixel at its depth into every src view
    X = jnp.stack([depth * rx, depth * ry, depth], axis=-1)        # cam frame
    Xw = jnp.einsum("ji,hwj->hwi", ref_cam.R, X) + ref_cam.c

    def per_view(K, R, t):
        xc = jnp.einsum("ij,hwj->hwi", R, Xw) + t
        h = jnp.einsum("ij,hwj->hwi", K, xc)
        z = jnp.where(jnp.abs(h[..., 2]) < 1e-12, 1e-12, h[..., 2])
        sx = h[..., 0] / z
        sy = h[..., 1] / z
        # src-frame ray at the projected (rounded) pixel
        sxi = jnp.floor(sx + 0.5)
        syi = jnp.floor(sy + 0.5)
        srx = (sxi - K[0, 2]) / K[0, 0]
        sry = (syi - K[1, 2]) / K[1, 1]
        ray_src = _normalize(jnp.stack([srx, sry, jnp.ones_like(srx)], axis=-1))
        # rotate into ref frame: R_ref R_src^T
        Rc = jnp.einsum("ij,kj->ik", ref_cam.R, R)
        return jnp.einsum("ij,hwj->hwi", Rc, ray_src)

    src_dirs = jax.vmap(per_view)(src_cams.K, src_cams.R, src_cams.t)
    src_dirs = jnp.moveaxis(src_dirs, 0, 2)                        # [H, W, V, 3]
    dirs = jnp.concatenate([ray_ref[:, :, None, :], src_dirs], axis=2)
    active = jnp.concatenate(
        [jnp.ones((H, W, 1), bool), sel_views.astype(bool)], axis=2)
    return dirs, active


def visibility_prior_normal(
    key: jax.Array,
    depth: jnp.ndarray,
    sel_views: jnp.ndarray,
    rx: jnp.ndarray, ry: jnp.ndarray,
    ref_cam: Camera, src_cams: Camera,
    samples: int = 8,
) -> jnp.ndarray:
    """Sample per-pixel unit normals facing away from all active view rays."""
    H, W = depth.shape
    dirs, active = view_direction_set(depth, sel_views, rx, ry, ref_cam, src_cams)
    cand = random_unit_normals(key, (samples, H, W))               # [S, H, W, 3]
    dots = jnp.einsum("shwc,hwvc->shwv", cand, dirs)
    ok = jnp.all((dots <= 0.0) | ~active[None], axis=-1)          # [S, H, W]
    first = jnp.argmax(ok, axis=0)                                # [H, W]
    any_ok = jnp.any(ok, axis=0)
    picked = jnp.take_along_axis(cand, first[None, :, :, None], axis=0)[0]
    # fallback: flip candidate 0 against the reference ray
    ray_ref = dirs[:, :, 0, :]
    flip = jnp.where(jnp.sum(cand[0] * ray_ref, -1, keepdims=True) > 0,
                     -cand[0], cand[0])
    return jnp.where(any_ok[..., None], picked, flip)


def perturbed_normal(
    key: jax.Array,
    normal: jnp.ndarray,          # [H, W, 3]
    rx: jnp.ndarray, ry: jnp.ndarray,
    perturbation: float,
) -> jnp.ndarray:
    """Small random rotation of the normal; keep original if it would face
    the camera (reference intent of GeneratePerturbedNormal, with Q3 fixed)."""
    H, W = normal.shape[:2]
    ang = jax.random.uniform(key, (H, W, 3), minval=-perturbation,
                             maxval=perturbation)
    a1, a2, a3 = ang[..., 0], ang[..., 1], ang[..., 2]
    s1, c1 = jnp.sin(a1), jnp.cos(a1)
    s2, c2 = jnp.sin(a2), jnp.cos(a2)
    s3, c3 = jnp.sin(a3), jnp.cos(a3)
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    # R = Rz(a1) Ry(a2) Rx(a3) applied row-wise
    px = (c1 * c2) * nx + (c1 * s2 * s3 - s1 * c3) * ny + (c1 * s2 * c3 + s1 * s3) * nz
    py = (s1 * c2) * nx + (s1 * s2 * s3 + c1 * c3) * ny + (s1 * s2 * c3 - c1 * s3) * nz
    pz = (-s2) * nx + (c2 * s3) * ny + (c2 * c3) * nz
    p = _normalize(jnp.stack([px, py, pz], axis=-1))
    ray = _normalize(jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1))
    faces_camera = jnp.sum(p * ray, axis=-1, keepdims=True) > 0
    return jnp.where(faces_camera, normal, p)


def random_depth(key: jax.Array, shape, depth_min, depth_max) -> jnp.ndarray:
    return jax.random.uniform(key, shape, minval=0.0, maxval=1.0) \
        * (depth_max - depth_min) + depth_min


def plane_from_normal_depth(normal, depth, xs, ys, ref_cam: Camera):
    """(n, depth at pixel) -> (n, w) plane hypothesis field."""
    w = dist_to_origin(normal, xs, ys, depth, ref_cam)
    return jnp.concatenate([normal, w[..., None]], axis=-1)
