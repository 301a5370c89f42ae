"""Batched bilateral-NCC matching cost.

Behavioral oracle: ``ComputeBilateralNCCOld`` (APD.cu:1023-1113) — windowed
bilateral-weighted NCC between the reference patch and its homography-warped
source patch; cost = clamp(1 - NCC, 0, 2), 2 on degenerate variance or a
center projecting outside the source view.

TPU-first redesign (not a port).  Hardware facts that shape it (measured on
v5e): XLA lowers arbitrary gathers to ~1e8 elements/s scalar loops, while
dense VPU work runs at multiple TFLOP/s.  Gathers are therefore the currency
to minimize:

  * ``warp`` mode (default): ONE bilinear gather per (pixel, view, candidate)
    builds a warped source field W(q) = src(H_{plane(q)}(q)); every NCC tap
    then reads W at a *static integer offset* — a free shifted view, no
    gather.  The tap at p+Δ evaluates the homography of the plane at p+Δ
    rather than at p; for locally consistent plane fields (the converged
    PatchMatch state) the two agree, and the deviation only appears at plane
    discontinuities.  144 gathers/(pixel·view) -> 4.
  * ``exact`` mode: the reference's per-center-plane window warp, 36 taps x 4
    bilinear gathers, used by tests and tiny problems.

Plane-independent quantities (bilateral weights, ref-side moments, per-view
homography constants) are precomputed once per pass into a ``CostContext``;
candidate evaluation touches only source-side sums.  The per-pixel adaptive
radius (``use_radius``, APD.cu:1042-1047) uses a normalized 6x6 tap grid
r * {±0.2, ±0.6, ±1.0}² which is exact for the default radius-5/increment-2
window.
"""

from __future__ import annotations

from typing import Optional, Tuple

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


def shift2(arr: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """out[..., y, x] = arr[..., y+dy, x+dx] (wrap; callers mask borders)."""
    return jnp.roll(arr, shift=(-dy, -dx), axis=(-2, -1))


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
    backend: str = struct.field(pytree_node=False, default="exact")
    strong_radius: int = struct.field(pytree_node=False, default=5)
    packed_quads: Optional[jnp.ndarray] = None   # [V, H, W] int32 (pallas)
    packed_p2: Optional[jnp.ndarray] = None      # [V, ~H/2, W] int32 stride-2
                                                 # 4-row words (pack_p2)
    # fused-kernel inputs (pallas backend, static radius)
    ref_img: Optional[jnp.ndarray] = None        # [H, W]
    cam_cx: Optional[jnp.ndarray] = None         # scalar
    cam_cy: Optional[jnp.ndarray] = None
    sigma_spatial: Optional[jnp.ndarray] = None
    sigma_color: Optional[jnp.ndarray] = None
    # static: context carries an adaptive per-pixel radius map (fused
    # kernel ineligible; falls back to the moment kernel)
    has_radius_map: bool = struct.field(pytree_node=False, default=False)
    # static: weights drop the spatial term (ComputeBilateralWeight_YZL)
    color_only: bool = struct.field(pytree_node=False, default=False)

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
    radius_map: Optional[jnp.ndarray] = None,
    strong_radius: int = 5,
    src_wh: Optional[jnp.ndarray] = None,
    backend: str = "exact",
    color_only_weights: bool = False,
) -> CostContext:
    """Precompute everything the candidate loop reuses.

    ``src_cams`` carries a leading [V] axis. ``radius_map`` (int/float [H,W])
    enables the adaptive window; zeros fall back to ``strong_radius``.
    """
    H, W = ref_img.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
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
    static_int = static_radius and all(
        float(t * strong_radius).is_integer() for t in _TAP_AXIS)
    if static_int:
        # integer static offsets: one edge pad + static slices, no gathers
        pad = int(strong_radius)
        ref_pad = jnp.pad(ref_img, pad, mode="edge")
    for t in range(T):
        gx, gy = float(taps[t, 0]), float(taps[t, 1])
        if static_int:
            dx, dy = int(gx * strong_radius), int(gy * strong_radius)
            ref_t = jax.lax.dynamic_slice(ref_pad, (pad + dy, pad + dx),
                                          (H, W))
            spatial = jnp.asarray(np.hypot(dx, dy), jnp.float32)
        elif static_radius:
            dx, dy = gx * strong_radius, gy * strong_radius
            ref_t = bilinear_sample(ref_img, xs + dx, ys + dy)
            spatial = jnp.asarray(np.hypot(dx, dy), jnp.float32)
        else:
            dx = gx * radius
            dy = gy * radius
            ref_t = bilinear_sample(ref_img, xs + dx, ys + dy)
            spatial = jnp.hypot(dx, dy)
        # reference weight: exp(-dist/(2 s_sp^2) - |dI|/(2 s_c^2)), note the
        # NON-squared distances (APD.cu:776-781) — reproduced as-is.  The
        # weak-pixel (deformable) cost drops the spatial term
        # (ComputeBilateralWeight_YZL, APD.cu:783-788).
        if color_only_weights:
            w = jnp.exp(-jnp.abs(ref_t - ref_img)
                        / (2.0 * sigma_color * sigma_color))
        else:
            w = jnp.exp(-spatial / (2.0 * sigma_spatial * sigma_spatial)
                        - jnp.abs(ref_t - ref_img)
                        / (2.0 * sigma_color * sigma_color))
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

    packed = p2 = None
    if backend == "pallas":
        from .ncc_fused import GATHER_MODE, pack_p1, pack_quads
        packed = pack_quads(src_imgs)
        if GATHER_MODE == "p2":
            p2 = pack_p1(src_imgs)

    return CostContext(
        src_imgs=src_imgs, rx=rx, ry=ry, M=M, b=b,
        inv_fx=1.0 / ref_cam.fx, inv_fy=1.0 / ref_cam.fy,
        radius=radius, w_taps=w_taps, wref_taps=wref_taps,
        sum_w=sum_w, sum_wref=sum_wref, sum_wref2=sum_wref2,
        src_wh=jnp.asarray(src_wh, jnp.float32),
        backend=backend, strong_radius=strong_radius,
        packed_quads=packed, packed_p2=p2,
        ref_img=ref_img,
        cam_cx=jnp.asarray(ref_cam.cx, jnp.float32),
        cam_cy=jnp.asarray(ref_cam.cy, jnp.float32),
        sigma_spatial=sigma_spatial, sigma_color=sigma_color,
        has_radius_map=radius_map is not None,
        color_only=color_only_weights,
    )


def _warp_terms(ctx: CostContext, plane: jnp.ndarray):
    """Per-(view, pixel) homography pieces: base + i*col_x + j*col_y.

    plane [H, W, 4] -> nine [V, H, W] fields (all elementwise f32)."""
    n = plane[..., :3]
    w_d = plane[..., 3]
    s = (n[..., 0] * ctx.rx + n[..., 1] * ctx.ry + n[..., 2]) / w_d
    sx = n[..., 0] * ctx.inv_fx / w_d
    sy = n[..., 1] * ctx.inv_fy / w_d

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
    return (base0, base1, base2), (cx0, cx1, cx2), (cy0, cy1, cy2)


def _center_and_inview(ctx, base):
    base0, base1, base2 = base
    cz = jnp.where(jnp.abs(base2) < 1e-12, 1e-12, base2)
    cx_pix = base0 / cz
    cy_pix = base1 / cz
    sw = ctx.src_wh[:, 0, None, None]
    sh = ctx.src_wh[:, 1, None, None]
    in_view = ((cx_pix >= 0) & (cx_pix < sw) & (cy_pix >= 0) & (cy_pix < sh)
               & (base2 > 0))
    return cx_pix, cy_pix, in_view


def warp_field(ctx: CostContext, plane: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warped source field W[v](p) = src_v(H_{plane(p)}(p)) and validity.

    ONE bilinear gather per (view, pixel): the only gather in warp mode.
    Returns (warped [V, H, W], in_view [V, H, W]).
    """
    base, _, _ = _warp_terms(ctx, plane)
    cx_pix, cy_pix, in_view = _center_and_inview(ctx, base)
    warped = _bilinear_sample_batch(ctx.src_imgs, cx_pix, cy_pix)
    return warped, in_view


def _ncc_from_moments(ctx, sum_wsrc, sum_wsrc2, sum_wrefsrc, in_view):
    inv = 1.0 / ctx.sum_w
    m_ref = ctx.sum_wref * inv                    # [H, W]
    m_ref2 = ctx.sum_wref2 * inv
    m_src = sum_wsrc * inv                        # [V, H, W]
    m_src2 = sum_wsrc2 * inv
    m_refsrc = sum_wrefsrc * inv

    var_ref = m_ref2 - m_ref * m_ref
    var_src = m_src2 - m_src * m_src
    covar = m_refsrc - m_ref * m_src
    var_prod = jnp.sqrt(jnp.maximum(var_ref * var_src, 0.0))
    ncc = covar / jnp.maximum(var_prod, 1e-30)
    cost = jnp.clip(1.0 - ncc, 0.0, COST_MAX)
    degenerate = (var_ref < _K_MIN_VAR) | (var_src < _K_MIN_VAR)
    cost = jnp.where(degenerate | ~in_view, COST_MAX, cost)
    return jnp.moveaxis(cost, 0, -1)              # [H, W, V]


def _ncc_cost_warp(ctx: CostContext, plane: jnp.ndarray) -> jnp.ndarray:
    """Warp-once NCC: static-shift taps over the warped source field."""
    H, W = ctx.shape
    V = ctx.num_views
    warped, in_view = warp_field(ctx, plane)

    taps = tap_grid()
    r = ctx.strong_radius
    sum_wsrc = jnp.zeros((V, H, W), jnp.float32)
    sum_wsrc2 = jnp.zeros((V, H, W), jnp.float32)
    sum_wrefsrc = jnp.zeros((V, H, W), jnp.float32)
    for t in range(taps.shape[0]):
        dx = float(taps[t, 0]) * r
        dy = float(taps[t, 1]) * r
        dxi, dyi = int(round(dx)), int(round(dy))
        src_t = shift2(warped, dxi, dyi)          # [V, H, W] free shift
        wt = ctx.w_taps[t]                        # [H, W]
        sum_wsrc = sum_wsrc + wt * src_t
        sum_wsrc2 = sum_wsrc2 + wt * src_t * src_t
        sum_wrefsrc = sum_wrefsrc + ctx.wref_taps[t] * src_t
    return _ncc_from_moments(ctx, sum_wsrc, sum_wsrc2, sum_wrefsrc, in_view)


def _ncc_cost_exact(ctx: CostContext, plane: jnp.ndarray) -> jnp.ndarray:
    """Reference-exact NCC: per-tap homography warp of the center plane."""
    H, W = ctx.shape
    V = ctx.num_views
    base, colx, coly = _warp_terms(ctx, plane)
    base0, base1, base2 = base
    cx0, cx1, cx2 = colx
    cy0, cy1, cy2 = coly
    _, _, in_view = _center_and_inview(ctx, base)

    taps = tap_grid()
    sum_wsrc = jnp.zeros((V, H, W), jnp.float32)
    sum_wsrc2 = jnp.zeros((V, H, W), jnp.float32)
    sum_wrefsrc = jnp.zeros((V, H, W), jnp.float32)
    for t in range(taps.shape[0]):
        gx, gy = float(taps[t, 0]), float(taps[t, 1])
        di = gx * ctx.radius
        dj = gy * ctx.radius
        hx = base0 + di * cx0 + dj * cy0
        hy = base1 + di * cx1 + dj * cy1
        hz = base2 + di * cx2 + dj * cy2
        hz = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
        src_t = _bilinear_sample_batch(ctx.src_imgs, hx / hz, hy / hz)
        wt = ctx.w_taps[t]
        sum_wsrc = sum_wsrc + wt * src_t
        sum_wsrc2 = sum_wsrc2 + wt * src_t * src_t
        sum_wrefsrc = sum_wrefsrc + ctx.wref_taps[t] * src_t
    return _ncc_from_moments(ctx, sum_wsrc, sum_wsrc2, sum_wrefsrc, in_view)


def ncc_cost(ctx: CostContext, plane: jnp.ndarray,
             view_mask: Optional[jnp.ndarray] = None,
             parity=None) -> jnp.ndarray:
    """Bilateral-NCC cost of one plane field.

    plane [H, W, 4] (ref-frame n, dist w) -> cost [H, W, V] in [0, 2].
    ``parity`` (pallas only) evaluates on a checkerboard-packed half grid
    whose ctx fields are packed to match.
    """
    if ctx.backend == "warp":
        assert parity is None
        return _ncc_cost_warp(ctx, plane)
    if ctx.backend == "pallas":
        from .ncc_fused import fused_cost_from_ctx
        return fused_cost_from_ctx(ctx, plane[None], view_mask=view_mask,
                                   parity=parity)[0]
    assert parity is None
    return _ncc_cost_exact(ctx, plane)


def _fused_eligible(ctx: CostContext) -> bool:
    """The fused v2 kernel covers every window configuration."""
    return ctx.backend == "pallas" and ctx.packed_quads is not None


def ncc_cost_batch(ctx: CostContext, planes: jnp.ndarray,
                   view_mask: Optional[jnp.ndarray] = None,
                   parity=None,
                   plane_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """planes [K, H', W', 4] -> costs [K, H', W', V].

    With the fused Pallas backend all K planes are evaluated in ONE kernel
    sweep (reference moments, weights and source images are read once);
    otherwise sequential over K.  ``view_mask`` ([Gi, Gj] int32 per-tile
    bitmask) skips views with zero MHJVS weight everywhere in a tile — exact
    for weighted-cost consumers.  ``parity`` evaluates on a checkerboard-
    packed half grid (the ctx fields must be packed to match).
    """
    if _fused_eligible(ctx):
        from .ncc_fused import fused_cost_from_ctx
        # view_chunk: B<=8 batches run fastest with 5-view chunks (fewer
        # kernel launches: 2 instead of 3 at V=10; measured round 5,
        # 6-plane vmask 63 -> 54 ms); large batches regress at 5 (VMEM
        # residency starves pipeline buffering, round-2 measurement).
        vc = 5 if planes.shape[0] <= 8 else 4
        return fused_cost_from_ctx(ctx, planes, parity=parity,
                                   view_mask=view_mask,
                                   plane_mask=plane_mask, view_chunk=vc)
    return jax.lax.map(lambda p: ncc_cost(ctx, p), planes)
