"""Fused disparity-sweep NCC Pallas kernel.

Oracle: the disparity sweeps of ``DepthToWeak`` (APD.cu:3892-4051) and
``LocalRefine`` (APD.cu:4053-4139): K candidate depths per pixel,
d_k = fx*bl / (disp0 + k), each scored by the view-weighted bilateral NCC.

Why a dedicated kernel beats routing the sweep through the generic fused
candidate kernel (kernels/ncc_fused.py): every sweep step shares the pixel's
surface, so under warp-field semantics (the framework's default cost mode,
see kernels/ncc.py) the source position of a pixel at step k is the
projection of the 3D point at depth d_k along its ray — whose homogeneous
coordinates are EXACTLY LINEAR in k:

    h(k) = M r + b / d_k = (M r + b / d0) + (k / (fx*bl)) * b

One banded gather per (view, k) over a halo'd tile region then yields the
warped source field, and all 36 NCC taps become static-offset slices of that
field (free VPU shifts) instead of 36 independent banded gathers — a ~10x
reduction in gather work, which dominates (XLA/VPU gathers are the expensive
currency on TPU; see the ncc.py module docstring).  Per-view fold weights
(MHJVS view weights x selected mask) are applied inside the kernel, so only
the [K, H, W] weighted sum leaves VMEM.

Semantics note (documented deviation): taps use the warp of the TAP pixel at
the swept disparity (field semantics) rather than the center pixel's plane
homography (the reference's constant-plane window).  For locally consistent
depth fields the two agree; tests assert the DepthToWeak classification
matches the exact path on smooth scenes.  The sweep always uses the static
strong-radius window (the adaptive radius map is a propagation-side feature;
DepthToWeak resets radius zeros to strong_radius anyway, APD.cu:4043-4048).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ncc import COST_MAX, _K_MIN_VAR, _TAP_AXIS

OT_H = 16               # output tile rows
OT_W = 256              # output tile lanes
HALO = 8                # region halo (>= window radius, sublane-aligned)
RT_H = OT_H + 2 * HALO  # 32 region rows
RT_W = OT_W + 16 * HALO  # 384 region lanes (left halo 8, right halo 120)
DSPAN = 8               # distinct row offsets served per gather sub-block
PAD_TOP = 8             # blank rows above the source quads
_N_XB = 2               # 256-col source band per (8,128) index block


def _gather_quads_8x128(quads_ref, v, x0i, y0i, Wsq, n_xb=_N_XB):
    """quads_ref[v][y0i, x0i] for an (8,128) block of int32 indices.

    Same aligned-load + roll + take_along_axis scheme as the fused candidate
    kernel (ncc_fused.py); indices are full-resolution source coords, quads
    are PAD_TOP row-padded so loads never clamp.
    """
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    delta = y0i + PAD_TOP - s_iota
    d_lo = jnp.maximum(jnp.min(delta), 1)
    dj = jnp.clip(delta - d_lo, 0, DSPAN - 1)
    cols = n_xb * 128
    x_lo = jnp.min(x0i)
    cbase = jnp.clip(x_lo, 0, max(Wsq - cols, 0))
    cbase = pl.multiple_of((cbase // 128) * 128, 128)
    xlocal = jnp.clip(x0i - cbase, 0, cols - 1)

    m0 = d_lo % 8
    a0 = pl.multiple_of(d_lo - m0, 8)
    up = (8 - m0) % 8
    in_lo = s_iota < 8 - m0

    g = jnp.zeros((8, 128), jnp.int32)
    nR = DSPAN // 8 + 1
    for xb in range(n_xb):
        col = pl.multiple_of(cbase + xb * 128, 128)
        loc = jnp.clip(xlocal - xb * 128, 0, 127)
        in_col = (xlocal >= xb * 128) & (xlocal < (xb + 1) * 128)
        blks = [quads_ref[v, pl.ds(a0 + u * 8, 8), pl.ds(col, 128)]
                for u in range(nR + 1)]
        rots = [pltpu.roll(bk, up, axis=0) for bk in blks]
        Rs = [jnp.where(in_lo, rots[u], rots[u + 1]) for u in range(nR)]
        for jj in range(DSPAN):
            r0 = Rs[jj // 8]
            jm = jj % 8
            if jm == 0:
                win = r0
            else:
                r1 = Rs[jj // 8 + 1]
                win = jnp.where(s_iota < 8 - jm,
                                pltpu.roll(r0, 8 - jm, axis=0),
                                pltpu.roll(r1, 8 - jm, axis=0))
            gg = jnp.take_along_axis(win, loc, axis=1)
            g = jnp.where((dj == jj) & in_col, gg, g)
    return g


def _tap_offsets(radius: int):
    offs = [int(round(float(a) * radius)) for a in _TAP_AXIS]
    return [(dy, dx) for dy in offs for dx in offs]   # row-major = tap_grid


def _make_sweep_kernel(K, Vc, T, k0, H_true, W_true, Wsq, radius):
    taps = _tap_offsets(radius)
    assert len(taps) == T
    n_rb = RT_H // 8
    n_cb = RT_W // 128

    def kernel(mats_ref, wh_ref, w_ref, wref_ref, sums_ref, vw_ref,
               coords_hbm, quads_ref, out_ref, scr_ref, sem):
        # mats_ref (SMEM): [Vc, 12] per-view M (row-major 9) + b (3)
        # wh_ref   (SMEM): [Vc, 2] source (width, height)
        # w_ref / wref_ref: [T, 16, 256] bilateral weights / weight*ref
        # sums_ref: [3, 16, 256] sum_w, sum_wref, sum_wref2
        # vw_ref:  [Vc, 16, 256] per-view fold weights
        # coords_hbm (ANY): [4, Hq+2*HALO, Wq+2*8HALO] rx, ry, 1/d0, 1/(fx*bl)
        # quads_ref: [Vc, PAD_TOP + Hsq + DSPAN + 24, Wsq] packed src quads
        # out_ref: [K, 16, 256] weighted cost sums
        # scr_ref: [4, RT_H, RT_W] VMEM coord region scratch
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            coords_hbm.at[:, pl.ds(i * OT_H, RT_H), pl.ds(j * OT_W, RT_W)],
            scr_ref, sem)
        cp.start()
        cp.wait()
        rx = scr_ref[0]
        ry = scr_ref[1]
        invd0 = scr_ref[2]
        invbl = scr_ref[3]

        inv = 1.0 / jnp.maximum(sums_ref[0], 1e-30)
        m_ref = sums_ref[1] * inv
        var_ref = sums_ref[2] * inv - m_ref * m_ref
        ref_bad = var_ref < _K_MIN_VAR

        out_ref[:] = jnp.zeros((K, OT_H, OT_W), jnp.float32)

        for v in range(Vc):
            m = [mats_ref[v, c] for c in range(12)]
            mr0 = m[0] * rx + m[1] * ry + m[2]
            mr1 = m[3] * rx + m[4] * ry + m[5]
            mr2 = m[6] * rx + m[7] * ry + m[8]
            src_w = wh_ref[v, 0]
            src_h = wh_ref[v, 1]
            vw = vw_ref[v]

            def k_body(k, _, mr0=mr0, mr1=mr1, mr2=mr2, m=m,
                       src_w=src_w, src_h=src_h, vw=vw):
                step = (k - k0).astype(jnp.float32)
                invd = invd0 + step * invbl
                hx = mr0 + m[9] * invd
                hy = mr1 + m[10] * invd
                hz = mr2 + m[11] * invd
                hzs = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
                pxu = hx / hzs
                pyu = hy / hzs
                px = jnp.clip(pxu, 0.0, W_true - 1.0)
                py = jnp.clip(pyu, 0.0, H_true - 1.0)

                # warped source field over the region, per (8,128) sub-block
                rows = []
                for bi in range(n_rb):
                    cells = []
                    for bj in range(n_cb):
                        sl = (slice(bi * 8, bi * 8 + 8),
                              slice(bj * 128, bj * 128 + 128))
                        pxb = px[sl]
                        pyb = py[sl]
                        x0f = jnp.floor(pxb)
                        y0f = jnp.floor(pyb)
                        fx = pxb - x0f
                        fy = pyb - y0f
                        g = _gather_quads_8x128(
                            quads_ref, v, x0f.astype(jnp.int32),
                            y0f.astype(jnp.int32), Wsq)
                        i00 = (g & 0xFF).astype(jnp.float32)
                        i01 = ((g >> 8) & 0xFF).astype(jnp.float32)
                        i10 = ((g >> 16) & 0xFF).astype(jnp.float32)
                        i11 = ((g >> 24) & 0xFF).astype(jnp.float32)
                        val = ((i00 * (1 - fx) + i01 * fx) * (1 - fy)
                               + (i10 * (1 - fx) + i11 * fx) * fy)
                        cells.append(val)
                    rows.append(jnp.concatenate(cells, axis=1))
                wf = jnp.concatenate(rows, axis=0)      # [RT_H, RT_W]

                zero = jnp.zeros((OT_H, OT_W), jnp.float32)
                s1, s2, s3 = zero, zero, zero
                for t, (dy, dx) in enumerate(taps):
                    ws = jax.lax.slice(
                        wf, (HALO + dy, HALO + dx),
                        (HALO + dy + OT_H, HALO + dx + OT_W))
                    wt = w_ref[t]
                    s1 = s1 + wt * ws
                    s2 = s2 + wt * ws * ws
                    s3 = s3 + wref_ref[t] * ws

                m_src = s1 * inv
                var_src = s2 * inv - m_src * m_src
                covar = s3 * inv - m_ref * m_src
                var_prod = jnp.sqrt(jnp.maximum(var_ref * var_src, 0.0))
                ncc = covar / jnp.maximum(var_prod, 1e-30)
                cost = jnp.clip(1.0 - ncc, 0.0, COST_MAX)

                ctr = (slice(HALO, HALO + OT_H), slice(HALO, HALO + OT_W))
                in_view = ((pxu[ctr] >= 0) & (pxu[ctr] < src_w)
                           & (pyu[ctr] >= 0) & (pyu[ctr] < src_h)
                           & (hz[ctr] > 0))
                bad = ref_bad | (var_src < _K_MIN_VAR) | ~in_view
                cost = jnp.where(bad, COST_MAX, cost)

                out_ref[pl.ds(k, 1)] += (vw * cost)[None]
                return 0

            jax.lax.fori_loop(0, K, k_body, 0)

    return kernel


def _pad_hw(arr, Hq, Wq):
    pads = [(0, 0)] * (arr.ndim - 2)
    pads += [(0, Hq - arr.shape[-2]), (0, Wq - arr.shape[-1])]
    if all(p == (0, 0) for p in pads):
        return arr
    return jnp.pad(arr, pads)


@functools.partial(jax.jit, static_argnames=(
    "K", "k0", "radius", "view_chunk", "interpret"))
def sweep_weighted_ncc(
    inv_depth: jnp.ndarray,      # [H, W] 1/d0 (clamped positive)
    inv_fxbl: jnp.ndarray,       # [H, W] 1/(fx*baseline); 0 = no sweep motion
    rx: jnp.ndarray,             # [H, W] (x - cx)/fx
    ry: jnp.ndarray,             # [H, W]
    vweights: jnp.ndarray,       # [V, H, W] per-view fold weights
    w_taps: jnp.ndarray,         # [T, H, W]
    wref_taps: jnp.ndarray,      # [T, H, W]
    wsums: jnp.ndarray,          # [3, H, W]
    quads: jnp.ndarray,          # [V, H, W] int32 packed source quads
    M: jnp.ndarray,              # [V, 3, 3]
    bvec: jnp.ndarray,           # [V, 3]
    src_wh: jnp.ndarray,         # [V, 2]
    K: int,
    k0: int,
    radius: int = 5,
    view_chunk: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:                # [K, H, W] sum_v vw_v * cost_v
    """Weighted NCC costs of the K-step disparity sweep (steps k - k0)."""
    V, H, W = quads.shape
    T = w_taps.shape[0]
    Hq = -(-H // OT_H) * OT_H
    Wq = -(-W // OT_W) * OT_W
    Hsq = -(-H // 8) * 8
    Wsq = -(-W // 128) * 128

    coords = jnp.stack([rx, ry, inv_depth, inv_fxbl])
    coords = jnp.pad(_pad_hw(coords, Hq, Wq),
                     ((0, 0), (HALO, HALO), (8, RT_W - OT_W - 8)),
                     mode="edge")
    w_p = _pad_hw(w_taps, Hq, Wq)
    wref_p = _pad_hw(wref_taps, Hq, Wq)
    sums_p = _pad_hw(wsums, Hq, Wq)
    vw_p = _pad_hw(vweights, Hq, Wq)
    quads_p = jnp.pad(_pad_hw(quads, Hsq, Wsq),
                      ((0, 0), (PAD_TOP, DSPAN + 24), (0, 0)))

    grid = (Hq // OT_H, Wq // OT_W)

    def tile_spec(nlead):
        return pl.BlockSpec((nlead, OT_H, OT_W), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = jnp.zeros((K, Hq, Wq), jnp.float32)
    for v0 in range(0, V, view_chunk):
        Vc = min(view_chunk, V - v0)
        kern = _make_sweep_kernel(K, Vc, T, k0, H, W, Wsq, radius)
        mats = jnp.concatenate(
            [M[v0:v0 + Vc].reshape(Vc, 9), bvec[v0:v0 + Vc].reshape(Vc, 3)],
            axis=1)
        part = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[smem, smem, tile_spec(T), tile_spec(T), tile_spec(3),
                      tile_spec(Vc),
                      pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((K, OT_H, OT_W), lambda i, j: (0, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, Hq, Wq), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((4, RT_H, RT_W), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(mats, jnp.asarray(src_wh, jnp.float32), w_p, wref_p, sums_p,
          vw_p[v0:v0 + Vc], coords, quads_p[v0:v0 + Vc])
        out = out + part
    return out[:, :H, :W]


def sweep_weighted_from_ctx(ctx, depth, baseline, fx, vweights,
                            K: int, k0: int,
                            view_chunk: int = 4,
                            interpret: bool = False) -> jnp.ndarray:
    """[K, H, W] weighted NCC sums for the disparity sweep around ``depth``.

    ``ctx`` must be a pallas-backed CostContext without an adaptive radius
    map; ``vweights`` is [H, W, V] (view_weights * selected mask)."""
    inv_depth = 1.0 / jnp.maximum(depth, 1e-12)
    fxbl = fx * baseline
    inv_fxbl = jnp.where(fxbl > 0, 1.0 / jnp.maximum(fxbl, 1e-12), 0.0)
    wsums = jnp.stack([ctx.sum_w, ctx.sum_wref, ctx.sum_wref2])
    return sweep_weighted_ncc(
        inv_depth, inv_fxbl, ctx.rx, ctx.ry,
        jnp.moveaxis(vweights, -1, 0), ctx.w_taps, ctx.wref_taps, wsums,
        ctx.packed_quads, ctx.M, ctx.b, ctx.src_wh,
        K=K, k0=k0, radius=ctx.strong_radius,
        view_chunk=view_chunk, interpret=interpret)


def _make_warpfield_kernel(Vc, H_true, W_true, Wsq):
    def kernel(cam_ref, mats_ref, invd_ref, quads_ref, out_ref, inv_ref):
        # cam_ref (SMEM): [4 + 2*Vc] cx, cy, inv_fx, inv_fy, then per-view
        #                 (src_w, src_h)
        # invd_ref: [1, 8, 128] inverse depth of the plane field
        # quads_ref: [Vc, PAD_TOP + Hsq + DSPAN + 24, Wsq] packed src quads
        # out_ref: [Vc, 8, 128] warped intensities
        # inv_ref: [Vc, 8, 128] int32 in-view flags
        i = pl.program_id(0)
        j = pl.program_id(1)
        ys = (i * 8 + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
              ).astype(jnp.float32)
        xs = (j * 128 + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
              ).astype(jnp.float32)
        rx = (xs - cam_ref[0]) * cam_ref[2]
        ry = (ys - cam_ref[1]) * cam_ref[3]
        invd = invd_ref[0]

        for v in range(Vc):
            m = [mats_ref[v, c] for c in range(12)]
            hx = m[0] * rx + m[1] * ry + m[2] + m[9] * invd
            hy = m[3] * rx + m[4] * ry + m[5] + m[10] * invd
            hz = m[6] * rx + m[7] * ry + m[8] + m[11] * invd
            hzs = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
            pxu = hx / hzs
            pyu = hy / hzs
            px = jnp.clip(pxu, 0.0, W_true - 1.0)
            py = jnp.clip(pyu, 0.0, H_true - 1.0)
            x0f = jnp.floor(px)
            y0f = jnp.floor(py)
            fx = px - x0f
            fy = py - y0f
            g = _gather_quads_8x128(quads_ref, v, x0f.astype(jnp.int32),
                                    y0f.astype(jnp.int32), Wsq)
            i00 = (g & 0xFF).astype(jnp.float32)
            i01 = ((g >> 8) & 0xFF).astype(jnp.float32)
            i10 = ((g >> 16) & 0xFF).astype(jnp.float32)
            i11 = ((g >> 24) & 0xFF).astype(jnp.float32)
            val = ((i00 * (1 - fx) + i01 * fx) * (1 - fy)
                   + (i10 * (1 - fx) + i11 * fx) * fy)
            in_view = ((pxu >= 0) & (pxu < cam_ref[4 + 2 * v])
                       & (pyu >= 0) & (pyu < cam_ref[5 + 2 * v])
                       & (hz > 0))
            out_ref[pl.ds(v, 1)] = val[None]
            inv_ref[pl.ds(v, 1)] = in_view.astype(jnp.int32)[None]

    return kernel


@functools.partial(jax.jit, static_argnames=("view_chunk", "interpret"))
def warp_field_pallas(inv_depth, rx_unused, quads, M, bvec, cam_scalars,
                      src_wh, view_chunk: int = 6, interpret: bool = False):
    """W[v](p) = src_v(project(p at depth d(p))) via the banded gather.

    Same semantics as kernels.ncc.warp_field (ONE bilinear sample per
    (view, pixel) of the plane field's own warp) without the XLA gather.
    Returns (warped [V, H, W] f32, in_view [V, H, W] bool).
    """
    V, H, W = quads.shape
    Hq = -(-H // 8) * 8
    Wq = -(-W // 128) * 128
    invd = _pad_hw(inv_depth[None], Hq, Wq)
    quads_p = jnp.pad(_pad_hw(quads, Hq, Wq),
                      ((0, 0), (PAD_TOP, DSPAN + 24), (0, 0)))
    grid = (Hq // 8, Wq // 128)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def tile_spec(nlead):
        return pl.BlockSpec((nlead, 8, 128), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)

    outs, invs = [], []
    for v0 in range(0, V, view_chunk):
        Vc = min(view_chunk, V - v0)
        kern = _make_warpfield_kernel(Vc, H, W, Wq)
        cam = jnp.concatenate([
            jnp.asarray(cam_scalars, jnp.float32),
            jnp.asarray(src_wh[v0:v0 + Vc], jnp.float32).reshape(-1)])
        mats = jnp.concatenate(
            [M[v0:v0 + Vc].reshape(Vc, 9), bvec[v0:v0 + Vc].reshape(Vc, 3)],
            axis=1)
        w, iv = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[smem, smem, tile_spec(1),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(tile_spec(Vc), tile_spec(Vc)),
            out_shape=(jax.ShapeDtypeStruct((Vc, Hq, Wq), jnp.float32),
                       jax.ShapeDtypeStruct((Vc, Hq, Wq), jnp.int32)),
            interpret=interpret,
        )(cam, mats, invd, quads_p[v0:v0 + Vc])
        outs.append(w[:, :H, :W])
        invs.append(iv[:, :H, :W])
    return jnp.concatenate(outs), jnp.concatenate(invs).astype(bool)
