"""Batched bilateral-NCC matching cost.

Behavioral oracle: ``ComputeBilateralNCCOld`` (APD.cu:1023-1113) — windowed
bilateral-weighted NCC between the reference patch and its homography-warped
source patch; cost = clamp(1 - NCC, 0, 2), 2 on degenerate variance or a
center projecting outside the source view.

TPU-first redesign (not a port):

  * The CUDA kernel walks a serial per-thread window around each pixel and
    re-evaluates the reference-side sums for every candidate plane and view.
    Here all plane-independent quantities — per-tap bilateral weights, ref
    intensities and their weighted sums — are precomputed ONCE per pass into a
    ``CostContext``; candidate evaluation touches only source-side sums.
  * The homography is linear in the tap offset: warped(p + (i, j)) =
    proj(base + i*col_x + j*col_y) (see geometry.warp_terms), so per tap only
    two fused multiply-adds of 3-vectors + one projective divide + one
    bilinear gather remain.  Everything is dense [V, H, W] elementwise work on
    the VPU except the gather.
  * Candidate planes batch through ``lax.map`` (sequential, memory-bounded);
    views are vectorized.

The per-pixel adaptive radius (``use_radius``, APD.cu:1042-1047) is expressed
as a fixed 6x6 *normalized* tap grid r * {±0.2, ±0.6, ±1.0}² which reproduces
the reference exactly for the default radius=5/increment=2 window and scales
smoothly for larger radii (the reference re-derives increment = 2r/5).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..geometry.camera import Camera
from ..geometry.transforms import homography_terms

COST_MAX = 2.0
_K_MIN_VAR = 1e-5

# Normalized 6-point tap axis: radius * these = the reference window
# (-r, -3r/5, -r/5, r/5, 3r/5, r) == -radius..radius step increment for
# increment = 2r/5 (defaults r=5 -> -5,-3,-1,1,3,5; APD.cu:1059).
_TAP_AXIS = np.array([-1.0, -0.6, -0.2, 0.2, 0.6, 1.0], np.float32)


def tap_grid() -> np.ndarray:
    """[T, 2] normalized (gx, gy) tap offsets, T = 36."""
    gx, gy = np.meshgrid(_TAP_AXIS, _TAP_AXIS)
    return np.stack([gx.ravel(), gy.ravel()], axis=-1)


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of img [H, W] at float coords (border-clamped)."""
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)
    flat = img.reshape(-1)
    i00 = flat[y0i * W + x0i]
    i01 = flat[y0i * W + x1i]
    i10 = flat[y1i * W + x0i]
    i11 = flat[y1i * W + x1i]
    top = i00 * (1 - fx) + i01 * fx
    bot = i10 * (1 - fx) + i11 * fx
    return top * (1 - fy) + bot * fy


def _bilinear_sample_batch(imgs: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                           ) -> jnp.ndarray:
    """imgs [V, H, W]; x, y [V, ...] per-view float coords -> [V, ...]."""
    return jax.vmap(bilinear_sample)(imgs, x, y)


class CostContext(struct.PyTreeNode):
    """Plane-independent, per-pass precomputation for the NCC cost."""

    src_imgs: jnp.ndarray     # [V, H, W]
    rx: jnp.ndarray           # [H, W]   (x - cx) / fx
    ry: jnp.ndarray           # [H, W]
    M: jnp.ndarray            # [V, 3, 3]  K_src R_rel
    b: jnp.ndarray            # [V, 3]     K_src t_rel
    inv_fx: jnp.ndarray       # scalar 1/fx_ref
    inv_fy: jnp.ndarray
    radius: jnp.ndarray       # [H, W] per-pixel window radius
    w_taps: jnp.ndarray       # [T, H, W] bilateral weights
    wref_taps: jnp.ndarray    # [T, H, W] weight * ref intensity
    sum_w: jnp.ndarray        # [H, W]
    sum_wref: jnp.ndarray     # [H, W]
    sum_wref2: jnp.ndarray    # [H, W]
    src_wh: jnp.ndarray       # [V, 2] source view (width, height) bounds

    @property
    def num_views(self) -> int:
        return self.src_imgs.shape[0]

    @property
    def shape(self):
        return self.src_imgs.shape[1:]


def build_cost_context(
    ref_img: jnp.ndarray,
    src_imgs: jnp.ndarray,
    ref_cam: Camera,
    src_cams: Camera,
    sigma_spatial,
    sigma_color,
    radius_map: jnp.ndarray | None = None,
    strong_radius: int = 5,
    src_wh: jnp.ndarray | None = None,
) -> CostContext:
    """Precompute everything the candidate loop reuses.

    ``src_cams`` carries a leading [V] axis. ``radius_map`` (int/float [H,W])
    enables the adaptive window; zeros fall back to ``strong_radius``.
    """
    H, W = ref_img.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    rx = (xs - ref_cam.cx) / ref_cam.fx
    ry = (ys - ref_cam.cy) / ref_cam.fy
    M, b = homography_terms(ref_cam, src_cams)

    if radius_map is None:
        radius = jnp.full((H, W), float(strong_radius), jnp.float32)
    else:
        r = radius_map.astype(jnp.float32)
        radius = jnp.where(r <= 0, float(strong_radius), r)

    taps = tap_grid()                      # [T, 2] static
    T = taps.shape[0]
    sigma_spatial = jnp.asarray(sigma_spatial, jnp.float32)
    sigma_color = jnp.asarray(sigma_color, jnp.float32)

    w_list = []
    wref_list = []
    sum_wref2 = jnp.zeros((H, W), jnp.float32)
    static_radius = radius_map is None
    for t in range(T):
        gx, gy = float(taps[t, 0]), float(taps[t, 1])
        if static_radius:
            # default radius: integer offsets -> exact shifted reads
            dx, dy = gx * strong_radius, gy * strong_radius
            ref_t = bilinear_sample(ref_img, xs + dx, ys + dy)
            spatial = jnp.asarray(np.hypot(dx, dy), jnp.float32)
        else:
            dx = gx * radius
            dy = gy * radius
            ref_t = bilinear_sample(ref_img, xs + dx, ys + dy)
            spatial = jnp.hypot(dx, dy)
        # reference weight: exp(-dist/(2 s_sp^2) - |dI|/(2 s_c^2)), note the
        # NON-squared distances (APD.cu:776-781) — reproduced as-is.
        w = jnp.exp(-spatial / (2.0 * sigma_spatial * sigma_spatial)
                    - jnp.abs(ref_t - ref_img) / (2.0 * sigma_color * sigma_color))
        w_list.append(w)
        wref_list.append(w * ref_t)
        sum_wref2 = sum_wref2 + w * ref_t * ref_t

    w_taps = jnp.stack(w_list)             # [T, H, W]
    wref_taps = jnp.stack(wref_list)
    sum_w = jnp.sum(w_taps, axis=0)
    sum_wref = jnp.sum(wref_taps, axis=0)

    if src_wh is None:
        V = src_imgs.shape[0]
        src_wh = jnp.tile(jnp.asarray([[W, H]], jnp.float32), (V, 1))

    return CostContext(
        src_imgs=src_imgs, rx=rx, ry=ry, M=M, b=b,
        inv_fx=1.0 / ref_cam.fx, inv_fy=1.0 / ref_cam.fy,
        radius=radius, w_taps=w_taps, wref_taps=wref_taps,
        sum_w=sum_w, sum_wref=sum_wref, sum_wref2=sum_wref2,
        src_wh=jnp.asarray(src_wh, jnp.float32),
    )


def ncc_cost(ctx: CostContext, plane: jnp.ndarray) -> jnp.ndarray:
    """Bilateral-NCC cost of one plane field.

    plane [H, W, 4] (ref-frame n, dist w) -> cost [H, W, V] in [0, 2].
    """
    H, W = ctx.shape
    V = ctx.num_views
    n = plane[..., :3]
    w_d = plane[..., 3]

    s = (n[..., 0] * ctx.rx + n[..., 1] * ctx.ry + n[..., 2]) / w_d   # [H,W]
    sx = n[..., 0] * ctx.inv_fx / w_d
    sy = n[..., 1] * ctx.inv_fy / w_d

    # base = M u - b s ;  col_x = M[:,0]/fx - b sx ;  col_y = M[:,1]/fy - b sy
    # expanded elementwise (full f32 on the VPU, no implicit bf16 matmul)
    def mvu(Mv):  # Mv [V, 3] row of M -> [V, H, W]
        return (Mv[:, 0, None, None] * ctx.rx + Mv[:, 1, None, None] * ctx.ry
                + Mv[:, 2, None, None])

    base0 = mvu(ctx.M[:, 0]) - ctx.b[:, 0, None, None] * s
    base1 = mvu(ctx.M[:, 1]) - ctx.b[:, 1, None, None] * s
    base2 = mvu(ctx.M[:, 2]) - ctx.b[:, 2, None, None] * s
    cx0 = ctx.M[:, 0, 0, None, None] * ctx.inv_fx - ctx.b[:, 0, None, None] * sx
    cx1 = ctx.M[:, 1, 0, None, None] * ctx.inv_fx - ctx.b[:, 1, None, None] * sx
    cx2 = ctx.M[:, 2, 0, None, None] * ctx.inv_fx - ctx.b[:, 2, None, None] * sx
    cy0 = ctx.M[:, 0, 1, None, None] * ctx.inv_fy - ctx.b[:, 0, None, None] * sy
    cy1 = ctx.M[:, 1, 1, None, None] * ctx.inv_fy - ctx.b[:, 1, None, None] * sy
    cy2 = ctx.M[:, 2, 1, None, None] * ctx.inv_fy - ctx.b[:, 2, None, None] * sy

    # center in-bounds check (APD.cu:1039-1041)
    cz = jnp.where(jnp.abs(base2) < 1e-12, 1e-12, base2)
    cx_pix = base0 / cz
    cy_pix = base1 / cz
    sw = ctx.src_wh[:, 0, None, None]
    sh = ctx.src_wh[:, 1, None, None]
    in_view = ((cx_pix >= 0) & (cx_pix < sw) & (cy_pix >= 0) & (cy_pix < sh)
               & (base2 > 0))

    taps = tap_grid()
    T = taps.shape[0]
    sum_wsrc = jnp.zeros((V, H, W), jnp.float32)
    sum_wsrc2 = jnp.zeros((V, H, W), jnp.float32)
    sum_wrefsrc = jnp.zeros((V, H, W), jnp.float32)
    for t in range(T):
        gx, gy = float(taps[t, 0]), float(taps[t, 1])
        di = gx * ctx.radius   # [H, W]
        dj = gy * ctx.radius
        hx = base0 + di * cx0 + dj * cy0
        hy = base1 + di * cx1 + dj * cy1
        hz = base2 + di * cx2 + dj * cy2
        hz = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
        px = hx / hz
        py = hy / hz
        src_t = _bilinear_sample_batch(ctx.src_imgs, px, py)   # [V, H, W]
        wt = ctx.w_taps[t]                                     # [H, W]
        sum_wsrc = sum_wsrc + wt * src_t
        sum_wsrc2 = sum_wsrc2 + wt * src_t * src_t
        sum_wrefsrc = sum_wrefsrc + ctx.wref_taps[t] * src_t

    inv = 1.0 / ctx.sum_w
    m_ref = ctx.sum_wref * inv                    # [H, W]
    m_ref2 = ctx.sum_wref2 * inv
    m_src = sum_wsrc * inv                        # [V, H, W]
    m_src2 = sum_wsrc2 * inv
    m_refsrc = sum_wrefsrc * inv

    var_ref = m_ref2 - m_ref * m_ref              # [H, W]
    var_src = m_src2 - m_src * m_src              # [V, H, W]
    covar = m_refsrc - m_ref * m_src
    var_prod = jnp.sqrt(jnp.maximum(var_ref * var_src, 0.0))
    ncc = covar / jnp.maximum(var_prod, 1e-30)
    cost = jnp.clip(1.0 - ncc, 0.0, COST_MAX)
    degenerate = (var_ref < _K_MIN_VAR) | (var_src < _K_MIN_VAR)
    cost = jnp.where(degenerate | ~in_view, COST_MAX, cost)
    return jnp.moveaxis(cost, 0, -1)              # [H, W, V]


def ncc_cost_batch(ctx: CostContext, planes: jnp.ndarray) -> jnp.ndarray:
    """planes [K, H, W, 4] -> costs [K, H, W, V] (sequential over K)."""
    return jax.lax.map(lambda p: ncc_cost(ctx, p), planes)
