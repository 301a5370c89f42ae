"""Fused multi-plane multi-view bilateral-NCC Pallas kernel (v2).

The engine evaluates ~15 candidate planes x V views per pixel per
half-iteration (SURVEY §3.3).  This kernel computes, for B candidate plane
fields and a chunk of source views, the windowed bilateral-weighted NCC of
``ComputeBilateralNCCOld`` (APD.cu:1023-1113): 6x6 tap grid at radius r with
tap axis r*(-1,-0.6,-0.2,0.2,0.6,1) (= offsets -r..r step max(2, 2r/5), the
reference's loop for every legal quantized radius), cost = clip(1-NCC, 0, 2),
degenerate variance or out-of-view center -> 2.

Design (v2 — why it is fast on TPU):
  * a plane is passed as the 3-float field q(p) = n(p) / w(p); the source
    homography is rank-1 in q: H_v(p) = M_v - b_v q(p)^T, so the nine warp
    terms per (plane, view, pixel) are affine combos of q(p) with per-view
    scalars in SMEM — input traffic is 12 bytes/pixel/candidate.
  * bilateral weights and reference-side moments arrive as per-tap fields
    (computed once per pass by build_cost_context with static shifts, reused
    by every candidate batch) — this also supports the adaptive per-pixel
    radius map (use_radius, APD.cu:1042-1047) and the color-only
    (ComputeBilateralWeight_YZL) weak weights that v1 could not.
  * source pixels are gathered from VMEM-resident packed uint8 quads through
    a **dynamic banded gather**: per tap the kernel computes the tile's warp
    bounding box (scalar min/max reductions) and loops only over the 8x128
    source blocks it actually covers (`lax.fori_loop` with data-dependent
    trip counts).  Typical taps touch 1-2 row blocks x 1-2 lane blocks of
    the 48x512 window; v1 unconditionally walked a 32x256 band (4x8x2
    roll/gather steps), ~2.5x more vector work.
  * optional **checkerboard packing** (`parity=0/1`): the caller passes
    half-resolution fields holding only the active checkerboard color
    (full-res x = 2*lane + (y+parity)%2) so propagation costs are only
    computed for the pixels the half-iteration can update — the red-black
    scheme updates one color at a time (APD.cu:3127-3165); evaluating the
    other half is pure waste.  NCC taps have odd dx, dy, so every tap lands
    on the SAME color plane and the external weight fields pack consistently.
  * optional **per-tile view masks**: a [Gi, Gj] int32 bitmask marks which
    views have nonzero MHJVS weight anywhere in each tile; masked-out
    (tile, view) pairs write cost_max and skip all gathers.  Zero-weight
    views contribute nothing to the weighted costs used by refinement and
    the disparity sweeps (APD.cu:1369-1374, 3979-3987), so this is exact.

The only approximation (shared with v1) is the gather-band clamp: source
rows/cols warped further than 48 rows / 512 lanes beyond the tile's warp
minimum clamp to the band edge (pathological far warps; range checks
dominate such candidates).  The dynamic loops make the generous band free.
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
# Distinct row offsets served per (tile, plane, view).  Default 10: the
# interpolated per-(b,v) window anchors (see bv_cost) trade exact per-tap
# minima for pipelinable scalar anchors, and two extra dispersion slots
# absorb the anchor error — measured round 3 (608x800, V=10): DSPAN 9/10/12
# = 0.435/0.424/0.403 view-pass/s at acc2% 0.942/0.952/0.963; 10 keeps a
# safety margin over the 0.94 accuracy bar.
import os as _os_early
try:
    DSPAN = int(_os_early.environ.get("DVPMVS_DSPAN", "10"))
except ValueError:
    DSPAN = 10
if DSPAN < 4 or DSPAN > 16:
    DSPAN = 10
PAD_TOP = 8            # blank rows above the source (alignment never clamps)
P1_PAD_BOT = 40        # pack_p1 bottom slack: the aligned 24-row load chain
                       # never clamps (max anchor Hsq+PAD_TOP, +24 window)
N_JW = DSPAN // 2 + 1  # word-row dispersion steps of the p1 gather
COST_MAX = 2.0
_K_MIN_VAR = 1e-5

_TAP_AXIS = np.array([-1.0, -0.6, -0.2, 0.2, 0.6, 1.0], np.float32)

# Taps per fori_loop iteration: unrolling several independent taps per
# dynamic loop step lets Mosaic overlap their (serially dependent) gather
# chains without the code-size/compile-time blowup of a full static unroll.
import os as _os

def _parse_tap_unroll(raw: str) -> int:
    """Tuning override for scripts/tune_fused.py only; must be a positive
    divisor-friendly value — the 36-tap loop pads to a multiple of it, so
    silly values (0, negatives, >36) would break or bloat the kernel."""
    try:
        v = int(raw)
    except ValueError:
        return 2
    if v < 1 or v > 36:
        return 2
    return v

TAP_UNROLL = _parse_tap_unroll(_os.environ.get("DVPMVS_TAP_UNROLL", "2"))

# Source-gather layout: "p2" (stride-2 4-row words — half the row-dispersion
# steps and half the source VMEM of the quad layout) or "quad" (2x2 packed
# quads, the round-2 design).  Env override for A/B tuning only.
GATHER_MODE = _os.environ.get("DVPMVS_GATHER", "quad")
if GATHER_MODE not in ("p2", "quad"):
    GATHER_MODE = "quad"

# Timing-only ablations for scripts/tune_fused.py (WRONG NUMERICS — never
# set in production): "static_dlo" pins the gather-window anchors to
# constants (measures the per-tap vector->scalar reduction + dynamic-address
# cost); "nogather" skips the row-dispersion loop entirely.
ABLATE = _os.environ.get("DVPMVS_ABLATE", "")

# A/B experiment (round 5, roofline item): dynamic column-block trip count.
# The static loop always walks n_xb (2 dense / 3 packed) column blocks per
# tap; measured typical taps touch 1-2.  With DVPMVS_DYN_XB=1 the kernel
# derives per-tap lo/hi column blocks from interpolated x anchors (the max
# anchors are chords of a CONVEX per-tap maximum — upper bounds, as the min
# anchors are lower bounds of the concave minimum) and runs the block loop
# with a data-dependent fori trip count.  Same clamp-tail semantics (cap =
# the static n_xb).  MEASURED NEGATIVE (v5e, 608x800 packed B=17 V=10):
# 423 ms vs 166 ms static — ~1/3 less gather work loses 2.5x because the
# data-dependent trip count blocks Mosaic's software pipelining of the
# load/roll/gather chains (same lesson as the round-2 dynamic row spans).
# Retained as the measured record for the roofline analysis (BASELINE.md
# round-5); never enable in production.
DYN_XB = _os.environ.get("DVPMVS_DYN_XB", "") == "1"

def _tap_grid():
    gx, gy = np.meshgrid(_TAP_AXIS, _TAP_AXIS)
    return np.stack([gy.ravel(), gx.ravel()], axis=-1)   # [T, 2] (di, dj) rows

_TAP_GRID = _tap_grid()


def _round_bf16_bits(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> int32 bit pattern rounded to the nearest bf16 (high 16 bits).

    Finite non-negative inputs only (costs, weights): adding 0x8000 before
    truncation is round-to-nearest; exponent carry is the correct rounding.
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    return (bits + 0x8000) & ~0xFFFF


def pack_bf16_pair(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Two non-negative f32 fields -> one int32 (rounded bf16 halves).

    Keeps 16-bit payloads inside 32-bit lanes so Pallas tiles stay (8, 128)
    — TPU 16-bit dtypes want (16, 128) tiles, which the 8-row checkerboard
    grid can't provide without relayout copies.
    """
    h = _round_bf16_bits(hi)
    l = jax.lax.shift_right_logical(_round_bf16_bits(lo), 16)
    return h | l


def unpack_bf16_pair(packed: jnp.ndarray):
    """int32 -> (hi, lo) f32 fields (inverse of pack_bf16_pair)."""
    hi = jax.lax.bitcast_convert_type(packed & ~0xFFFF, jnp.float32)
    lo = jax.lax.bitcast_convert_type(packed << 16, jnp.float32)
    return hi, lo


def pack_quads(src_imgs: jnp.ndarray) -> jnp.ndarray:
    """[V, H, W] float 0..255 -> [V, H, W] int32 packed 2x2 quads.

    quad[y, x] = i(y,x) | i(y,x+1)<<8 | i(y+1,x)<<16 | i(y+1,x+1)<<24
    with edge clamping, so one gather at (floor(y), floor(x)) provides all
    four bilinear corners.
    """
    q = jnp.clip(jnp.round(src_imgs), 0, 255).astype(jnp.int32)
    right = jnp.concatenate([q[:, :, 1:], q[:, :, -1:]], axis=2)
    down = jnp.concatenate([q[:, 1:, :], q[:, -1:, :]], axis=1)
    downright = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    return q | (right << 8) | (down << 16) | (downright << 24)


def pack_p1(src_imgs: jnp.ndarray) -> jnp.ndarray:
    """[V, H, W] float 0..255 -> [V, PAD_TOP + H + P1_PAD_BOT, W] int32
    vertical 4-row words over the PADDED row space: P1[r, x] packs padded
    rows r..r+3 (PAD_TOP blank rows above the source, blanks below).

    For a pixel needing the bilinear row pair (y, y+1) the kernel picks the
    word at r = y + PAD_TOP - (delta & 1) with delta the tile's de-sloped
    row offset — r - s is always EVEN, so the row-dispersion loop steps over
    word rows in strides of 2: ceil(DSPAN/2)+1 steps instead of DSPAN, at
    the price of a second lane gather for the x+1 column (no longer
    co-packed as in pack_quads).
    """
    q = jnp.clip(jnp.round(src_imgs), 0, 255).astype(jnp.int32)
    qp = jnp.pad(q, ((0, 0), (PAD_TOP, P1_PAD_BOT), (0, 0)))
    r1 = jnp.concatenate([qp[:, 1:], qp[:, -1:]], axis=1)
    r2 = jnp.concatenate([qp[:, 2:], jnp.repeat(qp[:, -1:], 2, 1)], axis=1)
    r3 = jnp.concatenate([qp[:, 3:], jnp.repeat(qp[:, -1:], 3, 1)], axis=1)
    return qp | (r1 << 8) | (r2 << 16) | (r3 << 24)


def tap_axis_offsets() -> np.ndarray:
    """[36, 2] tap offsets for radius 1 (scale by the window radius)."""
    gx, gy = np.meshgrid(_TAP_AXIS, _TAP_AXIS)
    return np.stack([gx.ravel(), gy.ravel()], axis=-1)


def _make_fused_kernel(B, Vc, T, H_true, W_true, radius,
                       parity, per_pixel_radius, use_mask, use_pmask,
                       pack_out=True, gather_p2=False):
    """Kernel factory.

    Grid (Hq//8, Wq//128) over the (possibly checkerboard-packed) pixel
    space.  ``H_true x W_true`` is the full-resolution image extent (bounds
    tests and source windows are always full-res).  ``radius``: python float
    window radius (ignored when ``per_pixel_radius``).  ``parity``: None
    (dense) or 0/1 (checkerboard color).  ``use_mask``: per-tile view
    bitmask input present.
    """
    Hsq = -(-H_true // TILE_H) * TILE_H
    Wsq = -(-W_true // TILE_W) * TILE_W
    packed = parity is not None
    # static lane window: a tile spans 128 (dense) / 256 (packed) source
    # columns for near-identity warps, plus one block of slack
    n_xb = min(3 if packed else 2, Wsq // TILE_W)
    cols = n_xb * TILE_W

    def kernel(*refs):
        if use_mask:
            mask_ref = refs[0]
            refs = refs[1:]
        if use_pmask:
            pmask_ref = refs[0]
            refs = refs[1:]
        (cam_ref, mats_ref, taps_ref, q_ref, w_ref, wref_ref, sums_ref,
         rad_ref, quads_ref, out_ref) = refs
        # cam_ref  (SMEM): [4 + 2*Vc] = cx, cy, inv_fx, inv_fy, then
        #                  per-view (src_w, src_h) pairs flattened
        # mats_ref (SMEM): [Vc, 12] per-view M (row-major 9) + b (3)
        # taps_ref (SMEM): [T, 2] radius-1 tap axis offsets
        # q_ref:   [B, 3, 8, 128] candidate plane fields (n/w)
        # w_ref / wref_ref: [T, 8, 128] bilateral weights / weight*ref
        # sums_ref: [3, 8, 128] sum_w, sum_wref, sum_wref2
        # rad_ref: [1, 8, 128] per-pixel radius (iff per_pixel_radius)
        # quads_ref: [Vc, PAD_TOP + Hsq + DSPAN + 24, Wsq] packed source
        #            quads, row-padded (full VMEM, full-res coordinates)
        # out_ref (pack_out): [B, ceil(Vc/2), 8, 128] int32 costs as rounded
        #          bf16 view pairs (hi = view 2*vp, lo = view 2*vp + 1);
        #          else [B, Vc, 8, 128] f32 costs
        pid_i = pl.program_id(0)
        pid_j = pl.program_id(1)
        inv_fx = cam_ref[2]
        inv_fy = cam_ref[3]

        ys_i = (pid_i * TILE_H
                + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0))
        lane_i = (pid_j * TILE_W
                  + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1))
        if packed:
            xs_i = 2 * lane_i + ((ys_i + parity) % 2)
        else:
            xs_i = lane_i
        ys = ys_i.astype(jnp.float32)
        xs = xs_i.astype(jnp.float32)
        rx = (xs - cam_ref[0]) * inv_fx
        ry = (ys - cam_ref[1]) * inv_fy
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
        # pixels beyond the true extent carry garbage warps; keep them out
        # of the gather-band statistics (their outputs are sliced away)
        pad_mask = (ys_i >= H_true) | (xs_i >= W_true)

        inv = 1.0 / jnp.maximum(sums_ref[0], 1e-30)
        m_ref = sums_ref[1] * inv
        var_ref = sums_ref[2] * inv - m_ref * m_ref

        if per_pixel_radius:
            rad = rad_ref[0]

        def bv_cost(b, v):
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

            # ---- per-(b, v) gather-window anchors ----
            # Measured round 3: computing d_lo / x_lo per tap (72 vector->
            # scalar min-reductions feeding dynamic load addresses) was 42%
            # of kernel time (ablation DVPMVS_ABLATE=static_dlo: 296 ->
            # 171 ms).  The tile minimum of the warped row/col is CONCAVE in
            # the tap offset (min of per-pixel affine functions), so the
            # anchors at the two extreme taps bound every tap's anchor from
            # below via linear interpolation — 4 reductions per (b, v)
            # instead of 72, and the per-tap anchors become pure scalar
            # math available long before the loads (pipelinable).  The -1
            # guard absorbs floor() curvature; anchors lower than the true
            # minimum only shift the DSPAN window, clamping at the same
            # tail the band clamp already documents.
            rad_v = rad if per_pixel_radius else radius

            # Each anchor takes the per-pixel elementwise min over BOTH
            # extremes of the cross axis before its single reduction: the
            # warped row at fixed dj is a Mobius function of di (ratio of
            # affines, pole guarded), so its min over di in [-rad, rad] is
            # attained at an endpoint — corner taps (di, dj both at +-rad)
            # are covered exactly, at two extra vector evaluations and the
            # SAME 6 reductions per (b, v).
            def y_anchor(sgn):
                py_min = None
                for sgn_i in (-1.0, 1.0):
                    hy = base1 + sgn_i * rad_v * cxx1 + sgn * rad_v * cyy1
                    hz = base2 + sgn_i * rad_v * cxx2 + sgn * rad_v * cyy2
                    hz = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
                    py = jnp.clip(hy / hz, 0.0, H_true - 1.0)
                    py_min = py if py_min is None else jnp.minimum(py_min, py)
                de = jnp.floor(py_min).astype(jnp.int32) + PAD_TOP - s_iota
                return jnp.min(jnp.where(pad_mask, Hsq + PAD_TOP,
                                         de)).astype(jnp.float32)

            def x_anchor(sgn):
                px_min = None
                for sgn_j in (-1.0, 1.0):
                    hx = base0 + sgn * rad_v * cxx0 + sgn_j * rad_v * cyy0
                    hz = base2 + sgn * rad_v * cxx2 + sgn_j * rad_v * cyy2
                    hz = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
                    px = jnp.clip(hx / hz, 0.0, W_true - 1.0)
                    px_min = px if px_min is None else jnp.minimum(px_min, px)
                xe = jnp.floor(px_min).astype(jnp.int32)
                return jnp.min(jnp.where(pad_mask, Wsq - 1,
                                         xe)).astype(jnp.float32)

            # 3-point piecewise-linear interpolation: exact at the extreme
            # AND center taps (concavity makes each segment a lower bound);
            # 6 reductions per (b, v) instead of 72 per-tap ones
            d_lo_n, d_lo_c, d_lo_p = (y_anchor(-1.0), y_anchor(0.0),
                                      y_anchor(1.0))
            x_lo_n, x_lo_c, x_lo_p = (x_anchor(-1.0), x_anchor(0.0),
                                      x_anchor(1.0))

            if DYN_XB:
                def x_anchor_hi(sgn):
                    px_max = None
                    for sgn_j in (-1.0, 1.0):
                        hx = base0 + sgn * rad_v * cxx0 + sgn_j * rad_v * cyy0
                        hz = base2 + sgn * rad_v * cxx2 + sgn_j * rad_v * cyy2
                        hz = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
                        px = jnp.clip(hx / hz, 0.0, W_true - 1.0)
                        px_max = (px if px_max is None
                                  else jnp.maximum(px_max, px))
                    xe = jnp.floor(px_max).astype(jnp.int32)
                    return jnp.max(jnp.where(pad_mask, 0,
                                             xe)).astype(jnp.float32)

                x_hi_n, x_hi_c, x_hi_p = (x_anchor_hi(-1.0),
                                          x_anchor_hi(0.0),
                                          x_anchor_hi(1.0))

            def _anchor_interp(a, lo, mid, hi):
                """a in [-1, 1] -> piecewise lerp through (lo, mid, hi)."""
                return jnp.where(a <= 0.0,
                                 mid + (0.0 - a) * (lo - mid),
                                 mid + a * (hi - mid))

            def tap_body(t, moms):
                s1, s2, s3 = moms
                if per_pixel_radius:
                    di = taps_ref[t, 0] * rad
                    dj = taps_ref[t, 1] * rad
                else:
                    di = taps_ref[t, 0] * radius
                    dj = taps_ref[t, 1] * radius
                hx = base0 + di * cxx0 + dj * cyy0
                hy = base1 + di * cxx1 + dj * cyy1
                hz = base2 + di * cxx2 + dj * cyy2
                hz = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
                rz = 1.0 / hz
                px = jnp.clip(hx * rz, 0.0, W_true - 1.0)
                py = jnp.clip(hy * rz, 0.0, H_true - 1.0)
                x0f = jnp.floor(px)
                y0f = jnp.floor(py)
                fx = px - x0f
                fy = py - y0f
                x0i = x0f.astype(jnp.int32)
                y0i = y0f.astype(jnp.int32)

                if ABLATE == "static_dlo":
                    cbase = 0
                else:
                    if ABLATE == "exact_xlo":
                        x_lo = jnp.min(jnp.where(pad_mask, Wsq - 1, x0i))
                    else:
                        x_lo = (jnp.floor(_anchor_interp(
                            taps_ref[t, 0], x_lo_n, x_lo_c, x_lo_p))
                                .astype(jnp.int32) - 1)
                    cbase = jnp.clip(x_lo, 0, max(Wsq - cols, 0))
                    cbase = pl.multiple_of((cbase // TILE_W) * TILE_W,
                                           TILE_W)
                xlocal = jnp.clip(x0i - cbase, 0, cols - 1)

                if gather_p2:
                    # P1 layout (pack_p1): the word at padded row r packs
                    # rows r..r+3, so the bilinear pair (y0, y0+1) lives in
                    # the word at r = y0 + PAD_TOP - (delta & 1) at bytes
                    # (delta&1, delta&1 + 1) — and r - s = 2*(delta>>1) is
                    # EVEN, so the dispersion loop steps over word rows in
                    # strides of two: N_JW = DSPAN/2+1 shifted windows
                    # instead of DSPAN, each taken from ONE dynamically
                    # re-anchored 24-row window (static even rolls), at the
                    # price of a second lane gather for the x+1 column.
                    delta = y0i + PAD_TOP - s_iota          # >= 1 always
                    rr = delta >> 1
                    r_lo = jnp.maximum(
                        (jnp.floor(_anchor_interp(
                            taps_ref[t, 1], d_lo_n, d_lo_c, d_lo_p))
                         .astype(jnp.int32) - 1) >> 1, 0)
                    du = jnp.clip(rr - r_lo, 0, N_JW - 1)
                    b0 = (delta & 1) << 3          # byte shift of row y0
                    base2r = 2 * r_lo
                    m0 = base2r % TILE_H
                    a0 = pl.multiple_of(base2r - m0, TILE_H)
                    xlocB = jnp.clip(xlocal + 1, 0, cols - 1)

                    gA = jnp.zeros((TILE_H, TILE_W), jnp.int32)
                    gB = jnp.zeros((TILE_H, TILE_W), jnp.int32)
                    for xb in range(n_xb):
                        col = pl.multiple_of(cbase + xb * TILE_W, TILE_W)
                        locA = jnp.clip(xlocal - xb * TILE_W, 0, TILE_W - 1)
                        locB = jnp.clip(xlocB - xb * TILE_W, 0, TILE_W - 1)
                        inA = ((xlocal >= xb * TILE_W)
                               & (xlocal < (xb + 1) * TILE_W))
                        inB = ((xlocB >= xb * TILE_W)
                               & (xlocB < (xb + 1) * TILE_W))
                        # RW[k] = P1[base2r + k] for k in [0, 16): one
                        # dynamic roll re-anchors the aligned 24-row load
                        blks = jnp.concatenate(
                            [quads_ref[v, pl.ds(a0 + u * TILE_H, TILE_H),
                                       pl.ds(col, TILE_W)]
                             for u in range(3)], axis=0)     # [24, TILE_W]
                        RW = pltpu.roll(blks, (24 - m0) % 24, axis=0)
                        for jw in range(N_JW):
                            win = pltpu.roll(
                                RW, (24 - 2 * jw) % 24, axis=0)[:TILE_H]
                            ggA = jnp.take_along_axis(win, locA, axis=1)
                            ggB = jnp.take_along_axis(win, locB, axis=1)
                            hit = du == jw
                            gA = jnp.where(hit & inA, ggA, gA)
                            gB = jnp.where(hit & inB, ggB, gB)
                    wA = jax.lax.shift_right_logical(gA, b0)
                    wB = jax.lax.shift_right_logical(gB, b0)
                    i00 = (wA & 0xFF).astype(jnp.float32)
                    i10 = ((wA >> 8) & 0xFF).astype(jnp.float32)
                    i01 = (wB & 0xFF).astype(jnp.float32)
                    i11 = ((wB >> 8) & 0xFF).astype(jnp.float32)
                else:
                    # Row-offset decomposition: pixel (s, l) needs source
                    # row y0(s, l) = s + delta(s, l) - PAD_TOP (quads are
                    # padded by PAD_TOP blank rows so load addresses never
                    # clamp).  For smooth warps delta is nearly constant
                    # over the tile (row slope ~1), so DSPAN shifted windows
                    # anchored at min(delta) serve all 8 sublanes — unlike a
                    # rotate-and-select sweep where each of 8 rotations
                    # fills only the sublanes it happens to align.  Fully
                    # static structure: Mosaic software-pipelines straight-
                    # line code; data-dependent loops stall.
                    delta = y0i + PAD_TOP - s_iota          # >= 1 always
                    if ABLATE == "static_dlo":
                        d_lo = PAD_TOP
                    else:
                        d_lo = jnp.maximum(
                            jnp.floor(_anchor_interp(
                                taps_ref[t, 1], d_lo_n, d_lo_c, d_lo_p))
                            .astype(jnp.int32) - 1, 1)
                    dj_pix = jnp.clip(delta - d_lo, 0, DSPAN - 1)

                    # aligned 8-row base of the DSPAN+8 row window
                    m0 = d_lo % TILE_H
                    a0 = pl.multiple_of(d_lo - m0, TILE_H)
                    up = (TILE_H - m0) % TILE_H
                    in_lo = s_iota < TILE_H - m0

                    g = jnp.zeros((TILE_H, TILE_W), jnp.int32)
                    if ABLATE == "nogather":
                        g = quads_ref[v, pl.ds(a0, TILE_H),
                                      pl.ds(0, TILE_W)] + dj_pix
                    if DYN_XB and ABLATE not in ("nogather", "static_dlo"):
                        # data-dependent block count from the hi anchors
                        x_hi_t = (jnp.floor(_anchor_interp(
                            taps_ref[t, 0], x_hi_n, x_hi_c, x_hi_p))
                            .astype(jnp.int32) + 1)
                        b_lo = cbase // TILE_W
                        n_b = jnp.clip(x_hi_t // TILE_W - b_lo + 1, 1, n_xb)

                        def xb_body(xb, g):
                            col = pl.multiple_of(cbase + xb * TILE_W,
                                                 TILE_W)
                            loc = jnp.clip(xlocal - xb * TILE_W, 0,
                                           TILE_W - 1)
                            in_col = ((xlocal >= xb * TILE_W)
                                      & (xlocal < (xb + 1) * TILE_W))
                            nR = (DSPAN - 1 + TILE_H - 1) // TILE_H + 1
                            blks = [quads_ref[v,
                                              pl.ds(a0 + u * TILE_H,
                                                    TILE_H),
                                              pl.ds(col, TILE_W)]
                                    for u in range(nR + 1)]
                            rots = [pltpu.roll(bk, up, axis=0)
                                    for bk in blks]
                            Rs = [jnp.where(in_lo, rots[u], rots[u + 1])
                                  for u in range(nR)]
                            for j in range(DSPAN):
                                r0 = Rs[j // TILE_H]
                                jm = j % TILE_H
                                if jm == 0:
                                    win = r0
                                else:
                                    r1 = Rs[j // TILE_H + 1]
                                    win = jnp.where(
                                        s_iota < TILE_H - jm,
                                        pltpu.roll(r0, TILE_H - jm,
                                                   axis=0),
                                        pltpu.roll(r1, TILE_H - jm,
                                                   axis=0))
                                gg = jnp.take_along_axis(win, loc, axis=1)
                                g = jnp.where((dj_pix == j) & in_col, gg,
                                              g)
                            return g

                        g = jax.lax.fori_loop(0, n_b, xb_body, g)
                        i00 = (g & 0xFF).astype(jnp.float32)
                        i01 = ((g >> 8) & 0xFF).astype(jnp.float32)
                        i10 = ((g >> 16) & 0xFF).astype(jnp.float32)
                        i11 = ((g >> 24) & 0xFF).astype(jnp.float32)
                        src_t = ((i00 * (1 - fx) + i01 * fx) * (1 - fy)
                                 + (i10 * (1 - fx) + i11 * fx) * fy)
                        w = w_ref[t]
                        return (s1 + w * src_t,
                                s2 + w * src_t * src_t,
                                s3 + wref_ref[t] * src_t)
                    for xb in range(0 if ABLATE == "nogather" else n_xb):
                        col = pl.multiple_of(cbase + xb * TILE_W, TILE_W)
                        loc = jnp.clip(xlocal - xb * TILE_W, 0, TILE_W - 1)
                        in_col = ((xlocal >= xb * TILE_W)
                                  & (xlocal < (xb + 1) * TILE_W))

                        # R[u][s] = source row d_lo + u*8 + s: aligned loads
                        # realigned by one dynamic sublane roll + select
                        # (window spans DSPAN-1+TILE_H rows from d_lo)
                        nR = (DSPAN - 1 + TILE_H - 1) // TILE_H + 1
                        blks = [quads_ref[v, pl.ds(a0 + u * TILE_H, TILE_H),
                                          pl.ds(col, TILE_W)]
                                for u in range(nR + 1)]
                        rots = [pltpu.roll(bk, up, axis=0) for bk in blks]
                        Rs = [jnp.where(in_lo, rots[u], rots[u + 1])
                              for u in range(nR)]

                        for j in range(DSPAN):
                            # win[s] = source row d_lo + j + s
                            r0 = Rs[j // TILE_H]
                            jm = j % TILE_H
                            if jm == 0:
                                win = r0
                            else:
                                r1 = Rs[j // TILE_H + 1]
                                win = jnp.where(
                                    s_iota < TILE_H - jm,
                                    pltpu.roll(r0, TILE_H - jm, axis=0),
                                    pltpu.roll(r1, TILE_H - jm, axis=0))
                            gg = jnp.take_along_axis(win, loc, axis=1)
                            g = jnp.where((dj_pix == j) & in_col, gg, g)

                    i00 = (g & 0xFF).astype(jnp.float32)
                    i01 = ((g >> 8) & 0xFF).astype(jnp.float32)
                    i10 = ((g >> 16) & 0xFF).astype(jnp.float32)
                    i11 = ((g >> 24) & 0xFF).astype(jnp.float32)
                src_t = ((i00 * (1 - fx) + i01 * fx) * (1 - fy)
                         + (i10 * (1 - fx) + i11 * fx) * fy)
                w = w_ref[t]
                return (s1 + w * src_t,
                        s2 + w * src_t * src_t,
                        s3 + wref_ref[t] * src_t)

            zeros = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            unroll = TAP_UNROLL if T % TAP_UNROLL == 0 else 1

            def chunk_body(tc, moms):
                for u in range(unroll):
                    moms = tap_body(tc * unroll + u, moms)
                return moms

            s1, s2, s3 = jax.lax.fori_loop(
                0, T // unroll, chunk_body, (zeros, zeros, zeros))

            # center in-view test (tap offset (0, 0))
            pxc = base0 / czc
            pyc = base1 / czc
            in_view = ((pxc >= 0) & (pxc < cam_ref[4 + 2 * v])
                       & (pyc >= 0) & (pyc < cam_ref[5 + 2 * v])
                       & (base2 > 0))

            m_src = s1 * inv
            var_src = s2 * inv - m_src * m_src
            covar = s3 * inv - m_ref * m_src
            var_prod = jnp.sqrt(jnp.maximum(var_ref * var_src, 0.0))
            ncc = covar / jnp.maximum(var_prod, 1e-30)
            cost = jnp.clip(1.0 - ncc, 0.0, COST_MAX)
            bad = (var_ref < _K_MIN_VAR) | (var_src < _K_MIN_VAR) | ~in_view
            return jnp.where(bad, COST_MAX, cost)

        if not pack_out:
            # unpacked f32 writer (tuning / fallback path)
            for v in range(Vc):
                def write_view(v=v):
                    def b_body(b, _):
                        if use_pmask:
                            pbit = (pmask_ref[pid_i, pid_j] >> b) & 1

                            @pl.when(pbit == 1)
                            def _():
                                out_ref[pl.ds(b, 1), pl.ds(v, 1)] = (
                                    bv_cost(b, v)[None, None])

                            @pl.when(pbit == 0)
                            def _():
                                out_ref[pl.ds(b, 1), pl.ds(v, 1)] = jnp.full(
                                    (1, 1, TILE_H, TILE_W), COST_MAX,
                                    jnp.float32)
                        else:
                            out_ref[pl.ds(b, 1), pl.ds(v, 1)] = (
                                bv_cost(b, v)[None, None])
                        return 0
                    jax.lax.fori_loop(0, B, b_body, 0)

                if use_mask:
                    bit = (mask_ref[pid_i, pid_j] >> v) & 1

                    @pl.when(bit == 1)
                    def _(v=v):
                        write_view(v)

                    @pl.when(bit == 0)
                    def _(v=v):
                        out_ref[:, pl.ds(v, 1)] = jnp.full(
                            (B, 1, TILE_H, TILE_W), COST_MAX, jnp.float32)
                else:
                    write_view(v)
            return

        # int32 pair of bf16(COST_MAX): the masked / missing-half filler
        cmax_packed = (0x4000 << 16) | 0x4000
        cpair_max = jnp.full((1, 1, TILE_H, TILE_W), cmax_packed, jnp.int32)

        n_pairs = (Vc + 1) // 2
        for vp in range(n_pairs):
            v0, v1 = 2 * vp, 2 * vp + 1

            def write_pair(vp=vp, v0=v0, v1=v1):
                def pair_cost(b):
                    c0 = bv_cost(b, v0)
                    c1 = (bv_cost(b, v1) if v1 < Vc else
                          jnp.full((TILE_H, TILE_W), COST_MAX, jnp.float32))
                    return pack_bf16_pair(c0, c1)[None, None]

                def b_body(b, _):
                    if use_pmask:
                        pbit = (pmask_ref[pid_i, pid_j] >> b) & 1

                        @pl.when(pbit == 1)
                        def _():
                            out_ref[pl.ds(b, 1), pl.ds(vp, 1)] = pair_cost(b)

                        @pl.when(pbit == 0)
                        def _():
                            out_ref[pl.ds(b, 1), pl.ds(vp, 1)] = cpair_max
                    else:
                        out_ref[pl.ds(b, 1), pl.ds(vp, 1)] = pair_cost(b)
                    return 0
                jax.lax.fori_loop(0, B, b_body, 0)

            if use_mask:
                # pair-level skip: compute only when either view is active
                # (a masked view inside an active pair writes a real cost,
                # which downstream weighted sums multiply by weight 0)
                bit = ((mask_ref[pid_i, pid_j] >> v0)
                       | (0 if v1 >= Vc else
                          (mask_ref[pid_i, pid_j] >> v1))) & 1

                @pl.when(bit == 1)
                def _(vp=vp):
                    write_pair()

                @pl.when(bit == 0)
                def _(vp=vp):
                    out_ref[:, pl.ds(vp, 1)] = jnp.broadcast_to(
                        cpair_max, (B, 1, TILE_H, TILE_W))
            else:
                write_pair()

    return kernel


def _pad_hw(arr, Hq, Wq):
    pads = [(0, 0)] * (arr.ndim - 2)
    pads += [(0, Hq - arr.shape[-2]), (0, Wq - arr.shape[-1])]
    if all(p == (0, 0) for p in pads):
        return arr
    return jnp.pad(arr, pads)


@functools.partial(jax.jit, static_argnames=(
    "radius", "parity", "view_chunk", "interpret", "pack_out"))
def fused_ncc_costs(
    q_planes: jnp.ndarray,        # [B, H', W', 3] candidate plane fields
    w_taps: jnp.ndarray,          # [T, H', W'] bilateral weights
    wref_taps: jnp.ndarray,       # [T, H', W'] weight * ref intensity
    wsums: jnp.ndarray,           # [3, H', W'] sum_w / sum_wref / sum_wref2
    quads: jnp.ndarray,           # [V, H, W] int32 packed source quads
    M: jnp.ndarray,               # [V, 3, 3] homography matrix terms
    bvec: jnp.ndarray,            # [V, 3]
    cam_scalars: jnp.ndarray,     # [4] cx, cy, inv_fx, inv_fy
    src_wh: jnp.ndarray,          # [V, 2] source extents
    radius: float = 5.0,          # static window radius
    radius_map: jnp.ndarray | None = None,   # [H', W'] per-pixel radius
    parity=None,                  # None dense; 0/1 checkerboard-packed
    view_mask: jnp.ndarray | None = None,   # [Gi, Gj] int32 per-tile bitmask
    plane_mask: jnp.ndarray | None = None,  # [Gi, Gj] int32 per-tile B-bits
    view_chunk: int = 4,
    interpret: bool = False,
    pack_out: bool = False,
    p2: jnp.ndarray | None = None,  # [V, R2, W] stride-2 words (pack_p2);
                                    # when given, replaces the quad gather
) -> jnp.ndarray:
    return _fused_ncc_costs_impl(
        q_planes, w_taps, wref_taps, wsums, quads, M, bvec, cam_scalars,
        src_wh, radius, radius_map, parity, view_mask, plane_mask,
        view_chunk, interpret, pack_out, p2)


def _fused_ncc_costs_impl(
    q_planes: jnp.ndarray,        # [B, H', W', 3] candidate plane fields
    w_taps: jnp.ndarray,          # [T, H', W'] bilateral weights
    wref_taps: jnp.ndarray,       # [T, H', W'] weight * ref intensity
    wsums: jnp.ndarray,           # [3, H', W'] sum_w / sum_wref / sum_wref2
    quads: jnp.ndarray,           # [V, H, W] int32 packed source quads
    M: jnp.ndarray,               # [V, 3, 3] homography matrix terms
    bvec: jnp.ndarray,            # [V, 3]
    cam_scalars: jnp.ndarray,     # [4] cx, cy, inv_fx, inv_fy
    src_wh: jnp.ndarray,          # [V, 2] source extents
    radius: float = 5.0,          # static window radius
    radius_map: jnp.ndarray | None = None,   # [H', W'] per-pixel radius
    parity=None,                  # None dense; 0/1 checkerboard-packed
    view_mask: jnp.ndarray | None = None,   # [Gi, Gj] int32 per-tile bitmask
    plane_mask: jnp.ndarray | None = None,  # [Gi, Gj] int32 per-tile B-bits
    view_chunk: int = 4,
    interpret: bool = False,
    pack_out: bool = False,
    p2: jnp.ndarray | None = None,
) -> jnp.ndarray:                 # [B, H', W', V]
    """Evaluate B candidate plane fields against V source views.

    Primed extents (H', W') are the evaluation grid — the full image when
    ``parity is None``, or the checkerboard-packed half grid (W' = ceil(W/2))
    for one red-black color.  ``quads`` always carries full resolution.

    Tuning notes (measured on v5e, 608x800 packed, B=17, V=10): the kernel
    is COMPUTE-bound on the banded-gather machinery, not HBM-bound —
    halving output stores (``pack_out``: rounded-bf16 view pairs in int32
    lanes) and weight reads changes nothing, and ``view_chunk=5`` REGRESSES
    30% (quads VMEM residency starves pipeline buffering).  Knobs retained
    for other shapes; defaults are the measured optimum.  Dynamic span
    loops don't pay either: the per-tile warp row span is mean 7 / p90 15
    at this geometry, so the static DSPAN=8 window is already matched.
    """
    B, Hp, Wp, _ = q_planes.shape
    V = quads.shape[0]
    H, W = quads.shape[1], quads.shape[2]
    T = w_taps.shape[0]
    Hq = -(-Hp // TILE_H) * TILE_H
    Wq = -(-Wp // TILE_W) * TILE_W
    Hsq = -(-H // TILE_H) * TILE_H
    Wsq = -(-W // TILE_W) * TILE_W

    per_pixel_radius = radius_map is not None

    q = _pad_hw(jnp.moveaxis(q_planes, -1, 1), Hq, Wq)       # [B, 3, Hq, Wq]
    w_p = _pad_hw(w_taps, Hq, Wq)
    wref_p = _pad_hw(wref_taps, Hq, Wq)
    sums_p = _pad_hw(wsums, Hq, Wq)
    # row padding: PAD_TOP blank rows above + DSPAN + 24 below so the
    # kernel's aligned load chain never needs clamping
    gather_p2 = p2 is not None
    if gather_p2:
        # pack_p1 output is already row-padded (PAD_TOP above, P1_PAD_BOT
        # below); only the columns need alignment padding
        quads_p = _pad_hw(p2, p2.shape[1], Wsq)
    else:
        quads_p = jnp.pad(_pad_hw(quads, Hsq, Wsq),
                          ((0, 0), (PAD_TOP, DSPAN + 24), (0, 0)))
    if per_pixel_radius:
        rad_p = _pad_hw(radius_map[None].astype(jnp.float32), Hq, Wq)
    else:
        rad_p = jnp.zeros((1, TILE_H, TILE_W), jnp.float32)

    grid = (Hq // TILE_H, Wq // TILE_W)
    use_mask = view_mask is not None
    use_pmask = plane_mask is not None
    taps = jnp.asarray(tap_axis_offsets())                   # [T, 2]

    def tile_spec(nlead):
        return pl.BlockSpec((nlead, TILE_H, TILE_W), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)

    q_spec = pl.BlockSpec((B, 3, TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                          memory_space=pltpu.VMEM)
    rad_spec = (tile_spec(1) if per_pixel_radius
                else pl.BlockSpec((1, TILE_H, TILE_W), lambda i, j: (0, 0, 0),
                                  memory_space=pltpu.VMEM))
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    outs = []
    for v0 in range(0, V, view_chunk):
        Vc = min(view_chunk, V - v0)
        kern = _make_fused_kernel(
            B, Vc, T, H, W, float(radius), parity, per_pixel_radius,
            use_mask, use_pmask, pack_out=pack_out, gather_p2=gather_p2)
        cam = jnp.concatenate([
            jnp.asarray(cam_scalars, jnp.float32),
            jnp.asarray(src_wh[v0:v0 + Vc], jnp.float32).reshape(-1)])
        mats = jnp.concatenate(
            [M[v0:v0 + Vc].reshape(Vc, 9), bvec[v0:v0 + Vc].reshape(Vc, 3)],
            axis=1)
        ins = [cam, mats, taps, q, w_p, wref_p, sums_p, rad_p,
               quads_p[v0:v0 + Vc]]
        in_specs = [smem, smem, smem, q_spec, tile_spec(T), tile_spec(T),
                    tile_spec(3), rad_spec, full]
        if use_pmask:
            ins = [plane_mask.astype(jnp.int32)] + ins
            in_specs = [smem] + in_specs
        if use_mask:
            vm = jax.lax.shift_right_logical(
                view_mask.astype(jnp.int32), v0)
            ins = [vm] + ins
            in_specs = [smem] + in_specs
        if pack_out:
            n_pairs = (Vc + 1) // 2
            out_spec = pl.BlockSpec((B, n_pairs, TILE_H, TILE_W),
                                    lambda i, j: (0, 0, i, j),
                                    memory_space=pltpu.VMEM)
            out_sd = jax.ShapeDtypeStruct((B, n_pairs, Hq, Wq), jnp.int32)
        else:
            out_spec = pl.BlockSpec((B, Vc, TILE_H, TILE_W),
                                    lambda i, j: (0, 0, i, j),
                                    memory_space=pltpu.VMEM)
            out_sd = jax.ShapeDtypeStruct((B, Vc, Hq, Wq), jnp.float32)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_sd,
            interpret=interpret,
        )(*ins)
        if pack_out:
            hi, lo = unpack_bf16_pair(out[..., :Hp, :Wp])
            # interleave the pair halves back to the view axis
            pair = jnp.stack([hi, lo], axis=2)               # [B, P, 2, H', W']
            outs.append(pair.reshape(B, 2 * n_pairs, Hp, Wp)[:, :Vc])
        else:
            outs.append(out[..., :Hp, :Wp])
    costs = jnp.concatenate(outs, axis=1)                    # [B, V, H', W']
    return jnp.moveaxis(costs, 1, -1)                        # [B, H', W', V]


def plane_to_q(plane: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (n, w) -> [..., 3] n/w."""
    w = plane[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return plane[..., :3] / w


def fused_cost_from_ctx(ctx, planes: jnp.ndarray,
                        parity=None,
                        view_mask: jnp.ndarray | None = None,
                        plane_mask: jnp.ndarray | None = None,
                        interpret: bool = False,
                        view_chunk: int = 4,
                        pack_out: bool = False) -> jnp.ndarray:
    """ncc_cost_batch-compatible entry: planes [B, H', W', 4] -> costs
    [B, H', W', V] on the evaluation grid (dense, or checkerboard-packed
    when ``parity`` is 0/1 — then the weight fields in ``ctx`` must already
    be packed, see engine/patchmatch.py pack helpers)."""
    cam = jnp.stack([ctx.cam_cx, ctx.cam_cy,
                     jnp.asarray(ctx.inv_fx, jnp.float32),
                     jnp.asarray(ctx.inv_fy, jnp.float32)])
    wsums = jnp.stack([ctx.sum_w, ctx.sum_wref, ctx.sum_wref2])
    return fused_ncc_costs(
        plane_to_q(planes), ctx.w_taps, ctx.wref_taps, wsums,
        ctx.packed_quads, ctx.M, ctx.b, cam, ctx.src_wh,
        radius=float(ctx.strong_radius),
        radius_map=ctx.radius if ctx.has_radius_map else None,
        parity=parity, view_mask=view_mask, plane_mask=plane_mask,
        interpret=interpret, view_chunk=view_chunk, pack_out=pack_out,
        p2=getattr(ctx, "packed_p2", None))
