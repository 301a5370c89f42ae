"""Batched geometric-consistency cost Pallas kernel.

Oracle: ``ComputeGeomConsistencyCost`` (APD.cu:1218-1256) — project the ref
pixel at a candidate depth into a source view, look up the source depth map
(nearest), back-project, re-project into the reference, and take the
clamped reprojection distance (see kernels/geom.py for the XLA reference
implementation).

Why a kernel: the source-depth lookup is one gather per (pixel, view,
candidate).  XLA lowers gathers to ~25M elem/s scalar loops on TPU, so the
REFINE_ITER passes (16 candidate evaluations per color per iteration in the
weak path, 73 sweep steps in DepthToWeak/LocalRefine) would spend tens of
seconds per view in lookups alone.  Here the lookup reuses the banded
aligned-load gather of the sweep kernel on bitcast float32 depth maps, and
all projection algebra runs on the VPU:

    h(d)  = M r + b / d            (same Mobius form as the NCC warp)
    sd    = depth_v[round(h.y/h.z), round(h.x/h.z)]
    X_src = sd * K_src^{-1} (sx, sy, 1)
    h2    = N X_src + g,   N = K_ref R_ref R_src^T,  g = K_ref(R_ref c_src + t_ref)
    cost  = min(3, || (x, y) - (h2.x/h2.z, h2.y/h2.z) ||),  3 if sd <= 0

Two output modes: per-view costs [K, H, W, V] (propagation/MHJVS consumers)
or the view-weight fold [K, H, W] (disparity sweeps, where [K, H, W, V]
would not fit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geom import GEOM_MAX, GeomContext
from .sweep_pallas import DSPAN, PAD_TOP, _gather_quads_8x128

TILE_H = 8
TILE_W = 128


def _make_geom_kernel(K, Vc, H_true, W_true, Wsq, fold, parity=None):
    n_xb = 3 if parity is not None else 2
    def kernel(cam_ref, mats_ref, invd_hbm, vw_ref, bits_ref, out_ref,
               invd_scr, sem):
        # cam_ref  (SMEM): [4] cx, cy, inv_fx, inv_fy (reference intrinsics)
        # mats_ref (SMEM): [Vc, 28] M(9) b(3) N(9) g(3) cxs cys ifxs ifys
        # invd_hbm (ANY):  [K, Hq, Wq] candidate inverse depths
        # vw_ref: [Vc, 8, 128] fold weights (fold mode; dummy otherwise)
        # bits_ref: [Vc, PAD_TOP + Hsq + DSPAN + 24, Wsq] f32-bitcast depths
        # out_ref: fold ? [K, 8, 128] : [K, Vc, 8, 128]
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            invd_hbm.at[:, pl.ds(i * TILE_H, TILE_H),
                        pl.ds(j * TILE_W, TILE_W)], invd_scr, sem)
        cp.start()
        cp.wait()

        ys_i = (i * TILE_H
                + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0))
        lane_i = (j * TILE_W
                  + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1))
        if parity is not None:
            xs_i = 2 * lane_i + ((ys_i + parity) % 2)
        else:
            xs_i = lane_i
        ys = ys_i.astype(jnp.float32)
        xs = xs_i.astype(jnp.float32)
        rx = (xs - cam_ref[0]) * cam_ref[2]
        ry = (ys - cam_ref[1]) * cam_ref[3]

        if fold:
            out_ref[:] = jnp.zeros((K, TILE_H, TILE_W), jnp.float32)

        for v in range(Vc):
            m = [mats_ref[v, c] for c in range(28)]
            mr0 = m[0] * rx + m[1] * ry + m[2]
            mr1 = m[3] * rx + m[4] * ry + m[5]
            mr2 = m[6] * rx + m[7] * ry + m[8]
            cxs, cys, ifxs, ifys = m[24], m[25], m[26], m[27]

            def k_body(k, _, mr0=mr0, mr1=mr1, mr2=mr2, m=m,
                       cxs=cxs, cys=cys, ifxs=ifxs, ifys=ifys, v=v):
                invd = invd_scr[k]
                hx = mr0 + m[9] * invd
                hy = mr1 + m[10] * invd
                hz = mr2 + m[11] * invd
                hzs = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
                sx = hx / hzs
                sy = hy / hzs
                xi = jnp.clip(sx + 0.5, 0.0, W_true - 1.0).astype(jnp.int32)
                yi = jnp.clip(sy + 0.5, 0.0, H_true - 1.0).astype(jnp.int32)
                bits = _gather_quads_8x128(bits_ref, v, xi, yi, Wsq,
                                           n_xb=n_xb)
                sd = pltpu.bitcast(bits, jnp.float32)

                bx = sd * (sx - cxs) * ifxs
                by = sd * (sy - cys) * ifys
                h2x = m[12] * bx + m[13] * by + m[14] * sd + m[21]
                h2y = m[15] * bx + m[16] * by + m[17] * sd + m[22]
                h2z = m[18] * bx + m[19] * by + m[20] * sd + m[23]
                h2zs = jnp.where(jnp.abs(h2z) < 1e-12, 1e-12, h2z)
                dx = xs - h2x / h2zs
                dy = ys - h2y / h2zs
                dist = jnp.sqrt(dx * dx + dy * dy)
                cost = jnp.minimum(GEOM_MAX, dist)
                cost = jnp.where((sd <= 0.0) | ~jnp.isfinite(dist),
                                 GEOM_MAX, cost)
                if fold:
                    out_ref[pl.ds(k, 1)] += (vw_ref[v] * cost)[None]
                else:
                    out_ref[pl.ds(k, 1), pl.ds(v, 1)] = cost[None, None]
                return 0

            jax.lax.fori_loop(0, K, k_body, 0)

    return kernel


def _geom_consts(gctx: GeomContext):
    """Per-view SMEM rows [V, 28] and ref cam scalars [4]."""
    V = gctx.src_depths.shape[0]
    M = jnp.einsum("vij,vjk,lk->vil", gctx.src_K, gctx.src_R,
                   gctx.ref_R)                     # K_s R_s R_r^T
    b = jnp.einsum("vij,vj->vi", gctx.src_K,
                   jnp.einsum("vij,j->vi", gctx.src_R, gctx.ref_c)
                   + gctx.src_t)                   # K_s (R_s c_r + t_s)
    N = jnp.einsum("ij,jk,vlk->vil", gctx.ref_K, gctx.ref_R,
                   gctx.src_R)                     # K_r R_r R_s^T
    g = (jnp.einsum("ij,vj->vi", gctx.ref_K,
                    jnp.einsum("ij,vj->vi", gctx.ref_R, gctx.src_c))
         + jnp.einsum("ij,j->i", gctx.ref_K, gctx.ref_t)[None])
    intr = jnp.stack([gctx.src_K[:, 0, 2], gctx.src_K[:, 1, 2],
                      1.0 / gctx.src_K[:, 0, 0], 1.0 / gctx.src_K[:, 1, 1]],
                     axis=1)                       # [V, 4]
    mats = jnp.concatenate([M.reshape(V, 9), b, N.reshape(V, 9), g, intr],
                           axis=1)
    fx = gctx.ref_K[0, 0]
    fy = gctx.ref_K[1, 1]
    cam = jnp.stack([gctx.ref_K[0, 2], gctx.ref_K[1, 2], 1.0 / fx, 1.0 / fy])
    return mats.astype(jnp.float32), cam.astype(jnp.float32)


def _pad_hw(arr, Hq, Wq):
    pads = [(0, 0)] * (arr.ndim - 2)
    pads += [(0, Hq - arr.shape[-2]), (0, Wq - arr.shape[-1])]
    if all(p == (0, 0) for p in pads):
        return arr
    return jnp.pad(arr, pads)


@functools.partial(jax.jit, static_argnames=("fold", "view_chunk",
                                             "parity", "interpret"))
def geom_cost_pallas(gctx: GeomContext, depth_stack: jnp.ndarray,
                     vweights: jnp.ndarray | None = None,
                     fold: bool = False, view_chunk: int = 4,
                     parity=None, interpret: bool = False) -> jnp.ndarray:
    """Geom costs of K candidate depth fields.

    depth_stack [K, H', W'] -> [K, H', W', V], or the vweights fold
    [K, H', W'] (``vweights`` [H', W', V], required with ``fold``).  With
    ``parity``, (H', W') is the checkerboard-packed half grid (the source
    depth maps stay full resolution).
    """
    V, H, W = gctx.src_depths.shape
    K, Hp, Wp = depth_stack.shape
    Hq = -(-Hp // TILE_H) * TILE_H
    Wq = -(-Wp // TILE_W) * TILE_W
    Hsq = -(-H // TILE_H) * TILE_H
    Wsq = -(-W // TILE_W) * TILE_W

    invd = jnp.where(depth_stack > 0, 1.0 / jnp.maximum(depth_stack, 1e-12),
                     0.0)
    invd = _pad_hw(invd, Hq, Wq)
    bits = jax.lax.bitcast_convert_type(
        _pad_hw(gctx.src_depths, Hsq, Wsq), jnp.int32)
    bits = jnp.pad(bits, ((0, 0), (PAD_TOP, DSPAN + 24), (0, 0)))
    mats, cam = _geom_consts(gctx)

    if fold:
        assert vweights is not None
        vw_p = _pad_hw(jnp.moveaxis(vweights, -1, 0), Hq, Wq)
    else:
        vw_p = jnp.zeros((V, Hq, Wq), jnp.float32)

    grid = (Hq // TILE_H, Wq // TILE_W)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def tile_spec(nlead):
        return pl.BlockSpec((nlead, TILE_H, TILE_W), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)

    outs = []
    acc = None
    for v0 in range(0, V, view_chunk):
        Vc = min(view_chunk, V - v0)
        kern = _make_geom_kernel(K, Vc, H, W, Wsq, fold, parity=parity)
        out_spec = (pl.BlockSpec((K, TILE_H, TILE_W), lambda i, j: (0, i, j),
                                 memory_space=pltpu.VMEM) if fold else
                    pl.BlockSpec((K, Vc, TILE_H, TILE_W),
                                 lambda i, j: (0, 0, i, j),
                                 memory_space=pltpu.VMEM))
        out_shape = (jax.ShapeDtypeStruct((K, Hq, Wq), jnp.float32) if fold
                     else jax.ShapeDtypeStruct((K, Vc, Hq, Wq), jnp.float32))
        part = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[smem, smem, pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                      tile_spec(Vc), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((K, TILE_H, TILE_W), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(cam, mats[v0:v0 + Vc], invd, vw_p[v0:v0 + Vc],
          bits[v0:v0 + Vc])
        if fold:
            acc = part if acc is None else acc + part
        else:
            outs.append(part[:, :, :Hp, :Wp])
    if fold:
        return acc[:, :Hp, :Wp]
    return jnp.moveaxis(jnp.concatenate(outs, axis=1), 1, -1)  # [K,H,W,V]
