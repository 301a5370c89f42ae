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

    Returns (dirs [V+1, 3, H, W], active [V+1, H, W]): slot 0 is the ref
    ray, slots 1..V the selected source-view rays expressed in the ref
    frame.  Component-major layout keeps the image dims on the TPU lanes
    (a trailing size-3/V axis runs the VPU nearly empty).  Directions are
    depth-independent up to the projection point (the reference's
    GetViewDirection normalizes away the depth scale).
    """
    H, W = depth.shape
    ones = jnp.ones_like(rx)

    def norm3(x, y, z):
        inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-24))
        return jnp.stack([x * inv, y * inv, z * inv])   # [3, H, W]

    ray_ref = norm3(rx, ry, ones)

    # world point of each pixel at its depth (component-major)
    Xc = jnp.stack([depth * rx, depth * ry, depth])     # [3, H, W]
    Rr = ref_cam.R
    Xw = jnp.stack([Rr[0, 0] * Xc[0] + Rr[1, 0] * Xc[1] + Rr[2, 0] * Xc[2]
                    + ref_cam.c[0],
                    Rr[0, 1] * Xc[0] + Rr[1, 1] * Xc[1] + Rr[2, 1] * Xc[2]
                    + ref_cam.c[1],
                    Rr[0, 2] * Xc[0] + Rr[1, 2] * Xc[1] + Rr[2, 2] * Xc[2]
                    + ref_cam.c[2]])

    def per_view(K, R, t):
        xc = jnp.stack([R[i, 0] * Xw[0] + R[i, 1] * Xw[1] + R[i, 2] * Xw[2]
                        + t[i] for i in range(3)])
        h = jnp.stack([K[i, 0] * xc[0] + K[i, 1] * xc[1] + K[i, 2] * xc[2]
                       for i in range(3)])
        z = jnp.where(jnp.abs(h[2]) < 1e-12, 1e-12, h[2])
        # src-frame ray at the projected (rounded) pixel
        sxi = jnp.floor(h[0] / z + 0.5)
        syi = jnp.floor(h[1] / z + 0.5)
        srx = (sxi - K[0, 2]) / K[0, 0]
        sry = (syi - K[1, 2]) / K[1, 1]
        ray_src = norm3(srx, sry, jnp.ones_like(srx))
        # rotate into ref frame: R_ref R_src^T
        Rc = jnp.einsum("ij,kj->ik", ref_cam.R, R)
        return jnp.stack([Rc[i, 0] * ray_src[0] + Rc[i, 1] * ray_src[1]
                          + Rc[i, 2] * ray_src[2] for i in range(3)])

    src_dirs = jax.vmap(per_view)(src_cams.K, src_cams.R, src_cams.t)
    dirs = jnp.concatenate([ray_ref[None], src_dirs])   # [V+1, 3, H, W]
    active = jnp.concatenate(
        [jnp.ones((1, H, W), bool), jnp.moveaxis(sel_views, -1, 0)])
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
    dirs, active = view_direction_set(depth, sel_views, rx, ry,
                                      ref_cam, src_cams)  # [V1,3,H,W]
    cand = random_unit_normals(key, (samples, H, W))      # [S, H, W, 3]
    cand_c = jnp.moveaxis(cand, -1, 1)                    # [S, 3, H, W]
    # all-directions facing test per candidate (component-major)
    ok = jnp.ones((samples, H, W), bool)
    for v in range(dirs.shape[0]):
        dot = (cand_c[:, 0] * dirs[v, 0] + cand_c[:, 1] * dirs[v, 1]
               + cand_c[:, 2] * dirs[v, 2])               # [S, H, W]
        ok = ok & ((dot <= 0.0) | ~active[v])
    first = jnp.argmax(ok, axis=0)                        # [H, W]
    any_ok = jnp.any(ok, axis=0)
    from .gatherfree import take0
    picked = take0(cand, first)
    # fallback: flip candidate 0 against the reference ray
    ray_ref = jnp.moveaxis(dirs[0], 0, -1)                # [H, W, 3]
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
    ang = jax.random.uniform(key, (3, H, W), minval=-perturbation,
                             maxval=perturbation)
    a1, a2, a3 = ang[0], ang[1], ang[2]
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
