"""Pallas TPU kernel for the bilateral-NCC source moments.

This is the hot op of the whole engine (SURVEY §3.3: one bilateral-NCC window
per (pixel, candidate plane, source view) dominates runtime).  XLA lowers the
required arbitrary 2D gathers to ~1e8 elem/s scalar loops; this kernel reaches
VPU rates by exploiting the warp's structure:

  * source pixels are pre-packed 2x2 into one int32 ("quad"), so ONE gather
    yields all four bilinear corners (sources are 8-bit anyway);
  * per (output tile, tap) the warped rows span a narrow band (the tile is 8
    ref rows; the homography is locally smooth), so the gather is banded: a
    dynamic row-slice of the in-VMEM source, then a bounded
    broadcast-row + lane-gather composition (Mosaic supports single-vreg
    lane gathers and 8-deep sublane gathers only);
  * everything else — homography taps, bilinear blend, weighted moments — is
    dense [8, 128] VPU arithmetic.

The kernel computes the three source-side moment fields; the (cheap) moment
-> cost arithmetic stays in XLA (shared with the other backends).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND = 32          # rows of source image visible to one (tile, tap) gather
TILE_H = 8
TILE_W = 128


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


def _banded_gather(quad_img, x0i, y0i, pad_mask, H, Wp):
    """Gather quad_img[y0i, x0i] for an [8, 128] tile of indices.

    quad_img: [H, Wp] int32 ref (full image in VMEM).  ``pad_mask`` marks
    tile lanes beyond the true image extent (their zero warp fields must not
    contaminate the band-minimum reduce).
    Returns [8, 128] int32.  Rows outside the BAND-row window around the
    tile's minimum row are clamped (callers mask such pixels as invalid).
    """
    nxb = Wp // TILE_W
    y_for_min = jnp.where(pad_mask, H - 1, y0i)
    y_start = jnp.clip(jnp.min(y_for_min), 0, max(H - BAND, 0))
    # sublane-align the band start (vector loads need row % 8 == 0)
    y_start = pl.multiple_of((y_start // TILE_H) * TILE_H, TILE_H)
    ylocal = jnp.clip(y0i - y_start, 0, BAND - 1)

    band = quad_img[pl.ds(y_start, BAND), :]                  # [BAND, Wp]
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    acc = jnp.zeros((TILE_H, TILE_W), jnp.int32)
    # Row alignment via static sublane rotations (Mosaic cannot broadcast a
    # dynamically sliced row across sublanes): rot_k[s] = block[(s+k) % 8],
    # so output sublane s reads band row ylocal when k = (ylocal - s) mod 8.
    for yb in range(BAND // TILE_H):
        block = band[yb * TILE_H:(yb + 1) * TILE_H]           # [8, Wp]
        yl8 = ylocal - yb * TILE_H
        in_blk = (yl8 >= 0) & (yl8 < TILE_H)
        # +32 biases the operand non-negative: compiled Mosaic irem is
        # truncated (C semantics) while interpret/XLA uses floor mod
        k_need = (yl8 - s_iota + 4 * TILE_H) % TILE_H
        for k in range(TILE_H):
            rot = pltpu.roll(block, (TILE_H - k) % TILE_H, axis=0)
            hit_k = in_blk & (k_need == k)
            for xb in range(nxb):
                blk = rot[:, xb * TILE_W:(xb + 1) * TILE_W]
                loc = jnp.clip(x0i - xb * TILE_W, 0, TILE_W - 1)
                g = jnp.take_along_axis(blk, loc, axis=1)
                hit = (hit_k & (x0i >= xb * TILE_W)
                       & (x0i < (xb + 1) * TILE_W))
                acc = jnp.where(hit, g, acc)
    return acc


def _make_moment_kernel(n_taps, H, Wp, H_true, W_true):

    def kernel(taps_ref, quad_ref, base0_ref, base1_ref, base2_ref,
               cx0_ref, cx1_ref, cx2_ref, cy0_ref, cy1_ref, cy2_ref,
               wt_ref, wr_ref, s1_ref, s2_ref, s3_ref):
        pid_i = pl.program_id(1)
        pid_j = pl.program_id(2)
        rows = (pid_i * TILE_H
                + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0))
        cols = (pid_j * TILE_W
                + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1))
        pad_mask = (rows >= H_true) | (cols >= W_true)
        base0 = base0_ref[0]
        base1 = base1_ref[0]
        base2 = base2_ref[0]
        cx0 = cx0_ref[0]
        cx1 = cx1_ref[0]
        cx2 = cx2_ref[0]
        cy0 = cy0_ref[0]
        cy1 = cy1_ref[0]
        cy2 = cy2_ref[0]

        def tap_body(t, sums):
            s1, s2, s3 = sums
            di = taps_ref[t, 0]           # SMEM scalar reads
            dj = taps_ref[t, 1]
            hx = base0 + di * cx0 + dj * cy0
            hy = base1 + di * cx1 + dj * cy1
            hz = base2 + di * cx2 + dj * cy2
            hz = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
            # clamp to the TRUE image extent (border-clamp sampling); the
            # padded region beyond it must never be read
            px = jnp.clip(hx / hz, 0.0, W_true - 1.0)
            py = jnp.clip(hy / hz, 0.0, H_true - 1.0)
            x0 = jnp.floor(px)
            y0 = jnp.floor(py)
            fx = px - x0
            fy = py - y0
            gathered = _banded_gather(
                quad_ref.at[0], x0.astype(jnp.int32), y0.astype(jnp.int32),
                pad_mask, H, Wp)

            i00 = (gathered & 0xFF).astype(jnp.float32)
            i01 = ((gathered >> 8) & 0xFF).astype(jnp.float32)
            i10 = ((gathered >> 16) & 0xFF).astype(jnp.float32)
            i11 = ((gathered >> 24) & 0xFF).astype(jnp.float32)
            top = i00 * (1 - fx) + i01 * fx
            bot = i10 * (1 - fx) + i11 * fx
            src_t = top * (1 - fy) + bot * fy

            wt = wt_ref[pl.ds(t, 1)][0]
            wr = wr_ref[pl.ds(t, 1)][0]
            return (s1 + wt * src_t,
                    s2 + wt * src_t * src_t,
                    s3 + wr * src_t)

        zeros = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        s1, s2, s3 = jax.lax.fori_loop(
            0, n_taps, tap_body, (zeros, zeros, zeros))
        s1_ref[0] = s1
        s2_ref[0] = s2
        s3_ref[0] = s3

    return kernel


def _pad_to(arr: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Zero-pad the trailing two dims up to (H, W)."""
    pads = [(0, 0)] * (arr.ndim - 2)
    pads += [(0, H - arr.shape[-2]), (0, W - arr.shape[-1])]
    if all(p == (0, 0) for p in pads):
        return arr
    return jnp.pad(arr, pads)


def source_moments_pallas(
    quads: jnp.ndarray,               # [V, H, W] int32 packed quads
    warp9: Tuple[jnp.ndarray, ...],   # nine [V, H, W] warp-term fields
    w_taps: jnp.ndarray,              # [T, H, W]
    wref_taps: jnp.ndarray,
    taps_dx, taps_dy,                 # static per-tap offsets (floats)
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the moment kernel -> (sum_wsrc, sum_wsrc2, sum_wrefsrc) [V, H, W]."""
    V, H, W = quads.shape
    T = w_taps.shape[0]
    Hp = -(-H // TILE_H) * TILE_H
    Wp = -(-W // TILE_W) * TILE_W

    quads_p = _pad_to(quads, Hp, Wp)
    warp9_p = [_pad_to(f, Hp, Wp) for f in warp9]
    wt_p = _pad_to(w_taps, Hp, Wp)
    wr_p = _pad_to(wref_taps, Hp, Wp)

    grid = (V, Hp // TILE_H, Wp // TILE_W)
    tile_spec = pl.BlockSpec((1, TILE_H, TILE_W), lambda v, i, j: (v, i, j),
                             memory_space=pltpu.VMEM)
    img_spec = pl.BlockSpec((1, Hp, Wp), lambda v, i, j: (v, 0, 0),
                            memory_space=pltpu.VMEM)
    wtap_spec = pl.BlockSpec((T, TILE_H, TILE_W), lambda v, i, j: (0, i, j),
                             memory_space=pltpu.VMEM)
    taps_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    kern = _make_moment_kernel(T, Hp, Wp, H, W)
    taps_arr = jnp.stack([jnp.asarray(taps_dx, jnp.float32),
                          jnp.asarray(taps_dy, jnp.float32)], axis=-1)

    out_shape = [jax.ShapeDtypeStruct((V, Hp, Wp), jnp.float32)] * 3
    s1, s2, s3 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[taps_spec, img_spec] + [tile_spec] * 9 + [wtap_spec] * 2,
        out_specs=[tile_spec] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(taps_arr, quads_p, *warp9_p, wt_p, wr_p)

    return s1[:, :H, :W], s2[:, :H, :W], s3[:, :H, :W]


def ncc_cost_pallas(ctx, plane: jnp.ndarray, interpret: bool = False
                    ) -> jnp.ndarray:
    """Drop-in NCC cost using the Pallas moment kernel. [H,W,4] -> [H,W,V]."""
    from .ncc import _warp_terms, _center_and_inview, _ncc_from_moments, tap_grid

    base, colx, coly = _warp_terms(ctx, plane)
    _, _, in_view = _center_and_inview(ctx, base)
    warp9 = (*base, *colx, *coly)

    taps = tap_grid()
    r = float(ctx.strong_radius)
    taps_dx = [float(t) * r for t in taps[:, 0]]
    taps_dy = [float(t) * r for t in taps[:, 1]]

    s1, s2, s3 = source_moments_pallas(
        ctx.packed_quads, warp9, ctx.w_taps, ctx.wref_taps,
        taps_dx, taps_dy, interpret=interpret)
    return _ncc_from_moments(ctx, s1, s2, s3, in_view)
