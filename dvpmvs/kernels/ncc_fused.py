"""Fused multi-plane multi-view bilateral-NCC Pallas kernel.

The engine evaluates ~15 candidate planes x V views per pixel per
half-iteration (SURVEY §3.3).  The first Pallas backend (ncc_pallas.py)
kept XLA-side warp fields: 9 x [V, H, W] homography-term fields PER PLANE
plus 72 re-read bilateral-weight fields per call — ~3 GB of HBM traffic per
candidate batch, which left the pass HBM-bound (~1.3 s/plane-eval measured
on v5e).

This kernel removes nearly all of that traffic by computing everything from
first principles inside VMEM:

  * a plane is passed as the 3-float field q(p) = n(p) / w(p) (normal over
    plane distance).  The source-view homography is rank-1 in q:
        H_v(p) = M_v - b_v q(p)^T   (in normalized ref-ray coords)
    so per (plane, view, pixel) the nine warp terms are affine combos of
    q(p) with PER-VIEW SCALARS (M_v, b_v in SMEM) — input traffic is
    12 bytes/pixel per candidate, independent of V;
  * bilateral weights are recomputed from the in-VMEM reference image
    (static integer tap offsets) instead of streamed: the spatial factor is
    a static per-tap constant, the color factor one exp per (tap, pixel),
    shared across ALL planes and views in the call;
  * all B candidate planes and a chunk of source views are evaluated in ONE
    grid sweep, so the reference-side moments are computed once per tile.

Cost semantics are identical to kernels/ncc.py:_ncc_cost_exact
(ComputeBilateralNCCOld, APD.cu:1023-1113): windowed bilateral-weighted NCC
over a 6x6 tap grid at static radius, cost = clip(1-NCC, 0, 2), degenerate
variance or out-of-view center -> 2.  The only approximation (shared with
ncc_pallas.py) is the 32-row gather band: source rows warped further than 32
rows from the tile minimum are clamped (pathological far warps; the engine's
range checks dominate such candidates anyway).

Limitations (callers fall back to the other backends):
  * static window radius only (the adaptive radius map feeds the XLA-side
    weight path);
  * tap offsets must be integers (radius a multiple of 5 with the 6-tap
    axis), which holds for the reference defaults.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
BAND = 32              # source rows visible to one (tile, plane, view)
COLS_MAX = 256         # source cols visible to one (tile, plane, view)
MARGIN_R = 12          # window slack rows below the center-warp minimum
MARGIN_C = 24          # window slack cols left of the center-warp minimum
PAD_L = 128            # lane padding of the reference image (aligned loads)
COST_MAX = 2.0
_K_MIN_VAR = 1e-5

_TAP_AXIS = np.array([-1.0, -0.6, -0.2, 0.2, 0.6, 1.0], np.float32)


def _tap_offsets(radius: int) -> np.ndarray:
    gx, gy = np.meshgrid(_TAP_AXIS * radius, _TAP_AXIS * radius)
    return np.stack([gx.ravel(), gy.ravel()], axis=-1)   # [36, 2]


def _make_fused_kernel(B, Vc, T, Hq, Wq, H_true, W_true, radius, pad):
    """Kernel factory.  Grid (Hq//8, Wq//128); per tile evaluates B planes x
    Vc views x T taps.  ``pad`` = ref-image border padding (>= radius)."""
    taps = _tap_offsets(radius)
    taps_i = np.round(taps).astype(int)
    assert np.allclose(taps, taps_i), "fused kernel needs integer taps"
    spatial = np.hypot(taps[:, 0], taps[:, 1]).astype(np.float32)
    band = min(BAND, Hq)
    nyb = band // TILE_H
    COLS = min(COLS_MAX, Wq)

    def kernel(cam_ref, mats_ref, wh_ref, q_ref, ref_ref, quads_ref,
               out_ref, wbuf_ref, rbuf_ref):
        # cam_ref  (SMEM): [6] = cx, cy, inv_fx, inv_fy, inv2ss, inv2sc
        # mats_ref (SMEM): [Vc, 12] per-view M (row-major 9) + b (3)
        # wh_ref   (SMEM): [Vc, 2] source width/height
        # q_ref:   [B, 3, 8, 128] candidate plane fields (n/w)
        # ref_ref: [Hq+2p, Wq+2p] padded reference image (full VMEM)
        # quads_ref: [Vc, Hq, Wq] packed source quads (full VMEM)
        # out_ref: [B, Vc, 8, 128] costs
        # wbuf_ref/rbuf_ref: [T, 8, 128] per-tap weights / shifted ref
        pid_i = pl.program_id(0)
        pid_j = pl.program_id(1)
        inv_fx = cam_ref[2]
        inv_fy = cam_ref[3]

        ys = (pid_i * TILE_H
              + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
              ).astype(jnp.float32)
        xs = (pid_j * TILE_W
              + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
              ).astype(jnp.float32)
        rx = (xs - cam_ref[0]) * inv_fx
        ry = (ys - cam_ref[1]) * inv_fy
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
        # pixels beyond the true extent carry garbage warps; keep them out
        # of the gather-band statistics (their outputs are sliced away)
        pad_mask = (ys >= H_true) | (xs >= W_true)

        lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)

        def ref_tile(dy, dx):
            """[8,128] window of the padded ref at static offset (dy, dx).

            Mosaic only allows aligned vector loads; an unaligned window is
            two aligned loads per axis, realigned with static rolls and a
            lane/sublane select.
            """
            r = pid_i * TILE_H + pad + dy           # pad % 8 == 0
            c = pid_j * TILE_W + PAD_L + dx         # PAD_L % 128 == 0
            ry_ = dy % TILE_H
            r0 = r - ry_                            # aligned row base
            cx_ = dx % TILE_W
            c0 = c - cx_                            # aligned col base

            def rows(row_base):
                a = ref_ref[pl.ds(row_base, TILE_H), pl.ds(c0, TILE_W)]
                if cx_:
                    b2 = ref_ref[pl.ds(row_base, TILE_H),
                                 pl.ds(c0 + TILE_W, TILE_W)]
                    a = jnp.where(lane < TILE_W - cx_,
                                  pltpu.roll(a, TILE_W - cx_, axis=1),
                                  pltpu.roll(b2, TILE_W - cx_, axis=1))
                return a

            top = rows(r0)
            if ry_ == 0:
                return top
            bot = rows(r0 + TILE_H)
            return jnp.where(s_iota < TILE_H - ry_,
                             pltpu.roll(top, TILE_H - ry_, axis=0),
                             pltpu.roll(bot, TILE_H - ry_, axis=0))

        ref_c = ref_tile(0, 0)

        # ---- per-tap weights + reference moments (plane/view-independent)
        sum_w = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        sum_wref = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        sum_wref2 = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        for t in range(T):
            rt = ref_tile(int(taps_i[t, 1]), int(taps_i[t, 0]))
            w = jnp.exp(-float(spatial[t]) * cam_ref[4]
                        - jnp.abs(rt - ref_c) * cam_ref[5])
            wbuf_ref[t] = w
            rbuf_ref[t] = rt
            sum_w += w
            sum_wref += w * rt
            sum_wref2 += w * rt * rt
        inv = 1.0 / sum_w
        m_ref = sum_wref * inv
        var_ref = sum_wref2 * inv - m_ref * m_ref

        # ---- per (plane, view) source moments -> cost
        def bv_body(idx, _):
            b = idx // Vc
            v = idx % Vc
            q0 = q_ref[b, 0]
            q1 = q_ref[b, 1]
            q2 = q_ref[b, 2]
            s = q0 * rx + q1 * ry + q2          # n.ray / w
            sx = q0 * inv_fx
            sy = q1 * inv_fy
            m = [mats_ref[v, i] for i in range(12)]
            base0 = (m[0] * rx + m[1] * ry + m[2]) - m[9] * s
            base1 = (m[3] * rx + m[4] * ry + m[5]) - m[10] * s
            base2 = (m[6] * rx + m[7] * ry + m[8]) - m[11] * s
            cxx0 = m[0] * inv_fx - m[9] * sx
            cxx1 = m[3] * inv_fx - m[10] * sx
            cxx2 = m[6] * inv_fx - m[11] * sx
            cyy0 = m[1] * inv_fy - m[9] * sy
            cyy1 = m[4] * inv_fy - m[10] * sy
            cyy2 = m[7] * inv_fy - m[11] * sy

            czc = jnp.where(jnp.abs(base2) < 1e-12, 1e-12, base2)

            def tap_body(t, moms):
                s1, s2, s3 = moms
                di = wh_ref[Vc + t, 0]          # taps appended below wh rows
                dj = wh_ref[Vc + t, 1]
                hx = base0 + di * cxx0 + dj * cyy0
                hy = base1 + di * cxx1 + dj * cyy1
                hz = base2 + di * cxx2 + dj * cyy2
                hz = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
                px = jnp.clip(hx / hz, 0.0, W_true - 1.0)
                py = jnp.clip(hy / hz, 0.0, H_true - 1.0)
                x0f = jnp.floor(px)
                y0f = jnp.floor(py)
                fx = px - x0f
                fy = py - y0f
                x0i = x0f.astype(jnp.int32)
                y0i = y0f.astype(jnp.int32)

                # per-tap banded window (rows: 32, cols: 256) anchored at
                # the tap's own minimum — pixels warping beyond it clamp
                # (same degradation class as the moment kernel's band);
                # loads come from the VMEM-resident source, so the window
                # costs vreg traffic only.  Value semantics, no branches.
                ybase = jnp.clip(jnp.min(jnp.where(pad_mask, Hq - 1, y0i)),
                                 0, max(Hq - band, 0))
                ybase = pl.multiple_of((ybase // TILE_H) * TILE_H, TILE_H)
                cbase = jnp.clip(jnp.min(jnp.where(pad_mask, Wq - 1, x0i)),
                                 0, max(Wq - COLS, 0))
                cbase = pl.multiple_of((cbase // TILE_W) * TILE_W, TILE_W)
                ylocal = jnp.clip(y0i - ybase, 0, band - 1)
                xlocal = jnp.clip(x0i - cbase, 0, COLS - 1)
                g = jnp.zeros((TILE_H, TILE_W), jnp.int32)
                for yb in range(nyb):
                    win = quads_ref[v, pl.ds(ybase + yb * TILE_H, TILE_H),
                                    pl.ds(cbase, COLS)]
                    yl8 = ylocal - yb * TILE_H
                    in_blk = (yl8 >= 0) & (yl8 < TILE_H)
                    # bias non-negative: compiled Mosaic irem is
                    # truncated (C) while interpret/XLA is floor mod
                    k_need = jnp.where(in_blk,
                                       (yl8 - s_iota + TILE_H) % TILE_H,
                                       -1)
                    for k in range(TILE_H):
                        rot = pltpu.roll(win, (TILE_H - k) % TILE_H,
                                         axis=0)
                        hit_k = k_need == k
                        for xb in range(COLS // TILE_W):
                            sub = rot[:, xb * TILE_W:(xb + 1) * TILE_W]
                            loc = jnp.clip(xlocal - xb * TILE_W,
                                           0, TILE_W - 1)
                            gg = jnp.take_along_axis(sub, loc, axis=1)
                            hit = (hit_k & (xlocal >= xb * TILE_W)
                                   & (xlocal < (xb + 1) * TILE_W))
                            g = jnp.where(hit, gg, g)

                i00 = (g & 0xFF).astype(jnp.float32)
                i01 = ((g >> 8) & 0xFF).astype(jnp.float32)
                i10 = ((g >> 16) & 0xFF).astype(jnp.float32)
                i11 = ((g >> 24) & 0xFF).astype(jnp.float32)
                src_t = ((i00 * (1 - fx) + i01 * fx) * (1 - fy)
                         + (i10 * (1 - fx) + i11 * fx) * fy)
                w = wbuf_ref[t]
                rt = rbuf_ref[t]
                return (s1 + w * src_t,
                        s2 + w * src_t * src_t,
                        s3 + (w * rt) * src_t)

            zeros = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            s1, s2, s3 = jax.lax.fori_loop(
                0, T, tap_body, (zeros, zeros, zeros))

            # center in-view test (tap offset (0, 0))
            pxc = base0 / czc
            pyc = base1 / czc
            in_view = ((pxc >= 0) & (pxc < wh_ref[v, 0])
                       & (pyc >= 0) & (pyc < wh_ref[v, 1])
                       & (base2 > 0))

            m_src = s1 * inv
            var_src = s2 * inv - m_src * m_src
            covar = s3 * inv - m_ref * m_src
            var_prod = jnp.sqrt(jnp.maximum(var_ref * var_src, 0.0))
            ncc = covar / jnp.maximum(var_prod, 1e-30)
            cost = jnp.clip(1.0 - ncc, 0.0, COST_MAX)
            bad = (var_ref < _K_MIN_VAR) | (var_src < _K_MIN_VAR) | ~in_view
            out_ref[pl.ds(b, 1), pl.ds(v, 1)] = jnp.where(
                bad, COST_MAX, cost)[None, None]
            return 0

        jax.lax.fori_loop(0, B * Vc, bv_body, 0)

    return kernel


def _pad_hw(arr, Hq, Wq):
    pads = [(0, 0)] * (arr.ndim - 2)
    pads += [(0, Hq - arr.shape[-2]), (0, Wq - arr.shape[-1])]
    if all(p == (0, 0) for p in pads):
        return arr
    return jnp.pad(arr, pads)


@functools.partial(jax.jit, static_argnames=("radius", "view_chunk",
                                             "interpret"))
def fused_ncc_costs(
    q_planes: jnp.ndarray,        # [B, H, W, 3] candidate plane n/w fields
    ref_img: jnp.ndarray,         # [H, W] f32 0..255
    quads: jnp.ndarray,           # [V, H, W] int32 packed source quads
    M: jnp.ndarray,               # [V, 3, 3] homography matrix terms
    bvec: jnp.ndarray,            # [V, 3]
    cam_scalars: jnp.ndarray,     # [4] cx, cy, inv_fx, inv_fy
    sigma_spatial, sigma_color,
    src_wh: jnp.ndarray,          # [V, 2] source extents
    radius: int = 5,
    view_chunk: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:                 # [B, H, W, V]
    """Evaluate B candidate plane fields against V source views."""
    B, H, W, _ = q_planes.shape
    V = quads.shape[0]
    T = 36
    Hq = -(-H // TILE_H) * TILE_H
    Wq = -(-W // TILE_W) * TILE_W
    pad = -(-radius // TILE_H) * TILE_H       # sublane-aligned border

    q = _pad_hw(jnp.moveaxis(q_planes, -1, 1), Hq, Wq)       # [B, 3, Hq, Wq]
    quads_p = _pad_hw(quads, Hq, Wq)
    # edge-replicate at the TRUE extent first (window reads near the true
    # right/bottom edge must see clamped values, not tile-grid zero pad);
    # lanes pad by PAD_L so every vector load stays 128-aligned
    ref_p = _pad_hw(jnp.pad(ref_img, ((pad, pad), (PAD_L, PAD_L)),
                            mode="edge"),
                    Hq + 2 * pad, Wq + 2 * PAD_L)

    inv2ss = 1.0 / (2.0 * sigma_spatial * sigma_spatial)
    inv2sc = 1.0 / (2.0 * sigma_color * sigma_color)
    cam = jnp.concatenate([
        jnp.asarray(cam_scalars, jnp.float32),
        jnp.stack([jnp.asarray(inv2ss, jnp.float32),
                   jnp.asarray(inv2sc, jnp.float32)])])

    mats = jnp.concatenate([M.reshape(V, 9), bvec.reshape(V, 3)], axis=1)
    taps = jnp.asarray(_tap_offsets(radius), jnp.float32)    # [T, 2]

    grid = (Hq // TILE_H, Wq // TILE_W)
    q_spec = pl.BlockSpec((B, 3, TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    outs = []
    for v0 in range(0, V, view_chunk):
        Vc = min(view_chunk, V - v0)
        kern = _make_fused_kernel(B, Vc, T, Hq, Wq, H, W, radius, pad)
        # taps ride below the per-view rows of the wh SMEM array
        wh_taps = jnp.concatenate(
            [jnp.asarray(src_wh[v0:v0 + Vc], jnp.float32), taps], axis=0)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
            + [q_spec, full, full],
            out_specs=pl.BlockSpec((B, Vc, TILE_H, TILE_W),
                                   lambda i, j: (0, 0, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Vc, Hq, Wq), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((T, TILE_H, TILE_W), jnp.float32),
                pltpu.VMEM((T, TILE_H, TILE_W), jnp.float32),
            ],
            interpret=interpret,
        )(cam, mats[v0:v0 + Vc], wh_taps, q, ref_p, quads_p[v0:v0 + Vc])
        outs.append(out[..., :H, :W])
    costs = jnp.concatenate(outs, axis=1)                    # [B, V, H, W]
    return jnp.moveaxis(costs, 1, -1)                        # [B, H, W, V]


def plane_to_q(plane: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (n, w) -> [..., 3] n/w."""
    w = plane[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return plane[..., :3] / w


def fused_cost_from_ctx(ctx, planes: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """ncc_cost_batch-compatible entry: planes [B, H, W, 4] -> [B, H, W, V].

    Uses the CostContext's precomputed M/b and packed quads; requires the
    static-radius window (the context must not carry an adaptive radius map).
    """
    cam = jnp.stack([ctx.cam_cx, ctx.cam_cy,
                     jnp.asarray(ctx.inv_fx, jnp.float32),
                     jnp.asarray(ctx.inv_fy, jnp.float32)])
    # color_only (ComputeBilateralWeight_YZL) = spatial factor 1 = inf sigma
    sigma_sp = jnp.where(ctx.color_only, jnp.inf, ctx.sigma_spatial)
    return fused_ncc_costs(
        plane_to_q(planes), ctx.ref_img, ctx.packed_quads, ctx.M, ctx.b, cam,
        sigma_sp, ctx.sigma_color, ctx.src_wh,
        radius=int(ctx.strong_radius), interpret=interpret)
