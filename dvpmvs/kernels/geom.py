"""Geometric-consistency (forward-backward reprojection) cost.

Oracle: ``ComputeGeomConsistencyCost`` (APD.cu:1218-1256): project the ref
pixel's plane depth into a source view, look up the source depth map
(nearest), back-project and re-project into the reference; the cost is the
reprojection distance clamped to 3.0 (also 3.0 where the source depth is 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..geometry.camera import Camera
from ..geometry.transforms import depth_from_plane

GEOM_MAX = 3.0


class GeomContext(struct.PyTreeNode):
    """Per-pass constants for the geometric consistency term."""

    src_depths: jnp.ndarray   # [V, H, W] source depth maps (prev pass)
    ref_K: jnp.ndarray        # [3, 3]
    ref_R: jnp.ndarray
    ref_t: jnp.ndarray
    ref_c: jnp.ndarray
    src_K: jnp.ndarray        # [V, 3, 3]
    src_R: jnp.ndarray
    src_t: jnp.ndarray
    src_c: jnp.ndarray
    rx: jnp.ndarray           # [H, W]
    ry: jnp.ndarray
    xs: jnp.ndarray           # [H, W] pixel x grid
    ys: jnp.ndarray


def build_geom_context(src_depths: jnp.ndarray, ref_cam: Camera,
                       src_cams: Camera) -> GeomContext:
    V, H, W = src_depths.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    return GeomContext(
        src_depths=src_depths,
        ref_K=ref_cam.K, ref_R=ref_cam.R, ref_t=ref_cam.t, ref_c=ref_cam.c,
        src_K=src_cams.K, src_R=src_cams.R, src_t=src_cams.t, src_c=src_cams.c,
        rx=(xs - ref_cam.cx) / ref_cam.fx,
        ry=(ys - ref_cam.cy) / ref_cam.fy,
        xs=xs, ys=ys,
    )


def _apply33(Mat, x, y, z):
    """row-wise 3x3 apply, elementwise (no bf16 matmul)."""
    return (Mat[0, 0] * x + Mat[0, 1] * y + Mat[0, 2] * z,
            Mat[1, 0] * x + Mat[1, 1] * y + Mat[1, 2] * z,
            Mat[2, 0] * x + Mat[2, 1] * y + Mat[2, 2] * z)


def geom_consistency_cost(gctx: GeomContext, depth: jnp.ndarray) -> jnp.ndarray:
    """depth [H, W] (plane depth at each ref pixel) -> cost [H, W, V]."""
    H, W = depth.shape

    # ref pixel -> world
    px = depth * gctx.rx
    py = depth * gctx.ry
    pz = depth
    wx, wy, wz = _apply33(gctx.ref_R.T, px, py, pz)
    wx = wx + gctx.ref_c[0]
    wy = wy + gctx.ref_c[1]
    wz = wz + gctx.ref_c[2]

    def per_view(src_K, src_R, src_t, src_c, src_depth):
        cxx, cyy, czz = _apply33(src_R, wx, wy, wz)
        cxx = cxx + src_t[0]
        cyy = cyy + src_t[1]
        czz = czz + src_t[2]
        hx, hy, hz = _apply33(src_K, cxx, cyy, czz)
        d_src = hz
        sx = hx / jnp.where(jnp.abs(d_src) < 1e-12, 1e-12, d_src)
        sy = hy / jnp.where(jnp.abs(d_src) < 1e-12, 1e-12, d_src)

        # nearest source-depth lookup ((int)(x + 0.5), APD.cu:1240)
        xi = jnp.clip((sx + 0.5).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip((sy + 0.5).astype(jnp.int32), 0, H - 1)
        sd = src_depth.reshape(-1)[yi * W + xi]

        # back-project the SOURCE pixel (float coords, nearest depth)
        bx = sd * (sx - src_K[0, 2]) / src_K[0, 0]
        by = sd * (sy - src_K[1, 2]) / src_K[1, 1]
        bz = sd
        wx2, wy2, wz2 = _apply33(src_R.T, bx, by, bz)
        wx2 = wx2 + src_c[0]
        wy2 = wy2 + src_c[1]
        wz2 = wz2 + src_c[2]

        # re-project into the reference
        rxx, ryy, rzz = _apply33(gctx.ref_R, wx2, wy2, wz2)
        rxx = rxx + gctx.ref_t[0]
        ryy = ryy + gctx.ref_t[1]
        rzz = rzz + gctx.ref_t[2]
        hx2, hy2, hz2 = _apply33(gctx.ref_K, rxx, ryy, rzz)
        hz2 = jnp.where(jnp.abs(hz2) < 1e-12, 1e-12, hz2)
        bxp = hx2 / hz2
        byp = hy2 / hz2

        dist = jnp.sqrt((gctx.xs - bxp) ** 2 + (gctx.ys - byp) ** 2)
        cost = jnp.minimum(GEOM_MAX, dist)
        invalid = (sd <= 0.0) | ~jnp.isfinite(dist)
        return jnp.where(invalid, GEOM_MAX, cost)

    costs = jax.vmap(per_view)(gctx.src_K, gctx.src_R, gctx.src_t,
                               gctx.src_c, gctx.src_depths)   # [V, H, W]
    return jnp.moveaxis(costs, 0, -1)
