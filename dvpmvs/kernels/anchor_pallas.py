"""Pallas kernel for the slot-exact anchor terms (weak-path hot loop).

Oracle: :func:`dvpmvs.kernels.deformable.anchor_cost_term_for_plane` — for
every candidate SLOT plane s, anchor a, source view v and compacted weak
pixel k, sample source v at the projection of anchor a's ray under slot
s's plane-induced homography, then reduce grouped weighted NCC moments
over the anchor axis (``ComputeBilateralNCCNew`` semantics,
/root/reference/APD.cu:835-1021; grouping per kernels/deformable.py).

Why a kernel: the XLA path is gather-bound — S*A*V*K one-element gathers
(~134M per half-iteration at bench scale) at XLA's ~86M elem/s dominate
the REFINE_ITER pass (measured 5.8 s of a 12.2 s pass, BASELINE.md
round-4).  Anchors of CONSECUTIVE compacted weak pixels are spatially
coherent (nearest-strong points along shared rays — provided the caller
compacts in BAND-MAJOR order, engine/patchmatch.py::_band_compact), so
their warped positions cluster: this kernel serves each (anchor, view)
tile from a bounded row window of the packed-quad source — one
dynamically-anchored chain of aligned loads per (anchor, column block),
then ASPAN STATIC roll steps each serving every slot's pixels at that row
offset via one lane gather (``take_along_axis``).  A first version used a
dynamic per-row loop (2 unaligned loads + a 16-row roll per served row,
~73 cycles/row); the static structure runs ~6 cycles/row and measured
3.4x faster end-to-end (306 -> 90 ms at bench scale).

Layout:
  * K compacts to tiles of 8x128 = 1024 pixels; grid = (V, K/1024).
  * sources are the ctx.packed_quads [V, H, W] int32 (each element packs
    its own 2x2 bilinear corners), padded to [V, PAD_TOP+H+PAD_BOT, Wp]
    so dynamic row slices never clamp; one view's pad block (~2.2 MB at
    608x800) stays VMEM-resident across the K tiles of its grid row.
  * per-view homography scalars (M, b), source extents and ref intrinsics
    ride in SMEM.
  * outputs are the blended per-(slot, view, pixel) anchor cost and the
    has-anchors mask, written per slot.

The moment math reproduces deformable.py's grouped NCC exactly (groups of
ceil(A/G) anchors, per-group >= _MIN_GROUP_SAMPLES gate, >= 4 total gate,
out-of-view anchors blended as COST_MAX).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deformable import (_K_MIN_VAR, _MIN_ANCHOR_SAMPLES,
                         _MIN_GROUP_SAMPLES, AnchorCostTerm)

COST_MAX = 2.0
TILE_H = 8
TILE_W = 128
KT_SIZE = TILE_H * TILE_W
PAD_TOP = 8          # dynamic row slices (base may undershoot) never clamp
# Static per-(anchor, col-block) gather window: ASPAN source rows served by
# STATIC roll steps from one dynamically-anchored chain of aligned loads
# (the round-3 dynamic per-row loop paid 2 dynamic loads + a 16-row roll
# per served row — ~73 cycles/row; the static structure costs ~6).  Window
# spans beyond ASPAN rows / NCB column blocks clamp to the window edge —
# the same documented tail the fused NCC kernel's DSPAN carries.  Measured
# (608x800, V=10, band-major compaction): span p50 48 / p90 59 / max 72,
# col blocks p90 3 / max 4.
ASPAN = 64
NCHAIN = ASPAN // TILE_H
NCB = 4
PAD_BOT = (NCHAIN + 2) * TILE_H + TILE_H   # chain loads never clamp


def _kernel(*refs, S, A, G, Ag, H_src, W_src, Wp, n_extra):
    if n_extra:
        (mats_ref, wh_ref, cam_ref, taps_ref, quads_ref, rax_ref, ray_ref,
         refa_ref, wcol_ref, vbits_ref, q_ref, cost_ref, has_ref,
         acc_ref, use_ref) = refs
    else:
        (mats_ref, wh_ref, quads_ref, rax_ref, ray_ref, refa_ref,
         wcol_ref, vbits_ref, q_ref, cost_ref, has_ref,
         acc_ref, use_ref) = refs
        cam_ref = taps_ref = None
    v = pl.program_id(0)   # this grid row's view

    m = [mats_ref[v, i] for i in range(12)]
    w_ext = wh_ref[v, 0]
    h_ext = wh_ref[v, 1]
    inv_fx = cam_ref[0] if n_extra else 0.0
    inv_fy = cam_ref[1] if n_extra else 0.0

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)

    # scratch accumulators (re-zeroed per grid cell): grouped moment sums
    # per (slot, group) + usable/oov counts per slot.  Scratch instead of
    # loop-carry keeps the anchor fori_loop's register state tiny (the
    # S x G x 7 moment grids would otherwise spill).
    acc_ref[...] = jnp.zeros_like(acc_ref)
    use_ref[...] = jnp.zeros_like(use_ref)

    def a_body(a, _):
        # anchor rays arrive precomputed (af.rax/ray) so px/py floor()
        # boundaries match the XLA oracle bitwise
        rax = rax_ref[0, a]
        ray_ = ray_ref[0, a]
        vm = ((jax.lax.shift_right_logical(vbits_ref[0, a], v) & 1) == 1)
        refa = refa_ref[0, a]
        wcol = wcol_ref[0, a]
        base_hx = m[0] * rax + m[1] * ray_ + m[2]
        base_hy = m[3] * rax + m[4] * ray_ + m[5]
        base_hz = m[6] * rax + m[7] * ray_ + m[8]

        # gather entries: (S slots) x (center + n_extra sparse-patch taps).
        # Tap t adds the ray offset (dx*inv_fx, dy*inv_fy) unpacked from
        # its precomputed sample word; its need/oov gating is the CENTER's
        # (deformable_cost_exact's convention) and its weight/ref ride the
        # word.  w_e/ref_e per entry feed the moment accumulation.
        tap_d = []                       # (ddx, ddy, w_t, ref_t) per tap
        for t in range(n_extra):
            word = taps_ref[0, 0, t, a]
            t_dy = ((word & 0xF) - 8).astype(jnp.float32)
            t_dx = (((word >> 4) & 0xF) - 8).astype(jnp.float32)
            t_w = ((word >> 8) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
            t_ref = ((word >> 16) & 0xFF).astype(jnp.float32)
            tap_d.append((t_dx * inv_fx, t_dy * inv_fy, t_w, t_ref))

        y0s, x0s, fxs, fys, needs, oovs = [], [], [], [], [], []
        w_es, ref_es = [], []
        y_lo = None
        y_hi = None
        x_lo = None
        x_hi = None
        for s in range(S):
            q0 = q_ref[0, s, 0]
            q1 = q_ref[0, s, 1]
            q2 = q_ref[0, s, 2]
            s_i = q0 * rax + q1 * ray_ + q2
            hx0 = base_hx - m[9] * s_i
            hy0 = base_hy - m[10] * s_i
            hz0 = base_hz - m[11] * s_i
            need_c = None
            for t in range(1 + n_extra):
                if t == 0:
                    hx, hy, hz = hx0, hy0, hz0
                else:
                    ddx, ddy, t_w, t_ref = tap_d[t - 1]
                    ds = q0 * ddx + q1 * ddy
                    hx = hx0 + m[0] * ddx + m[1] * ddy - m[9] * ds
                    hy = hy0 + m[3] * ddx + m[4] * ddy - m[10] * ds
                    hz = hz0 + m[6] * ddx + m[7] * ddy - m[11] * ds
                front = hz > 0
                hz = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
                px = hx / hz
                py = hy / hz
                pxc = jnp.clip(px, 0.0, W_src - 1.0)
                pyc = jnp.clip(py, 0.0, H_src - 1.0)
                x0f = jnp.floor(pxc)
                y0f = jnp.floor(pyc)
                x0 = x0f.astype(jnp.int32)
                y0 = y0f.astype(jnp.int32) + PAD_TOP   # padded row coords
                if t == 0:
                    in_view = ((px >= 0) & (px < w_ext) & (py >= 0)
                               & (py < h_ext) & front)
                    need_c = vm & in_view
                    needs.append(need_c)
                    oovs.append(vm & ~in_view)
                    w_es.append(wcol)
                    ref_es.append(refa)
                else:
                    needs.append(need_c)
                    w_es.append(t_w)
                    ref_es.append(t_ref)
                y0s.append(y0)
                x0s.append(x0)
                fxs.append(pxc - x0f)
                fys.append(pyc - y0f)
                ym = jnp.where(need_c, y0, 10 ** 8)
                yM = jnp.where(need_c, y0, -1)
                xm = jnp.where(need_c, x0, 10 ** 8)
                xM = jnp.where(need_c, x0, -1)
                y_lo = ym if y_lo is None else jnp.minimum(y_lo, ym)
                y_hi = yM if y_hi is None else jnp.maximum(y_hi, yM)
                x_lo = xm if x_lo is None else jnp.minimum(x_lo, xm)
                x_hi = xM if x_hi is None else jnp.maximum(x_hi, xM)

        # window bounds (vector->scalar reductions feeding the loop bounds;
        # 4 per anchor — the per-element gathers they replace cost far more)
        y_min = jnp.min(y_lo)
        y_max = jnp.max(y_hi)
        x_min = jnp.maximum(jnp.min(x_lo), 0)
        x_max = jnp.max(x_hi)
        any_need = y_max >= 0
        base = jnp.maximum(y_min - (TILE_H - 1), 1)    # PAD_TOP keeps >= 1
        cb_cap = max(Wp // TILE_W - NCB, 0)
        cb_lo = jnp.clip(x_min // TILE_W, 0, cb_cap)
        n_cb = jnp.where(any_need,
                         jnp.minimum(x_max // TILE_W - cb_lo + 1, NCB), 0)

        # per-entry window coordinates (rows/cols beyond the static window
        # clamp to its edge — the documented tail)
        E = S * (1 + n_extra)
        djs = [jnp.clip(y0s[e] - s_iota - base, 0, ASPAN - 1)
               for e in range(E)]
        xls = [jnp.clip(x0s[e] - cb_lo * TILE_W, 0, NCB * TILE_W - 1)
               for e in range(E)]

        # dynamically-anchored chain alignment (shared by every col block)
        m0 = base % TILE_H
        a0 = pl.multiple_of(base - m0, TILE_H)
        up = (TILE_H - m0) % TILE_H
        in_lo = s_iota < TILE_H - m0

        gath = [jnp.zeros((TILE_H, TILE_W), jnp.int32) for _ in range(E)]

        def cb_body(cb_i, gath):
            col = pl.multiple_of((cb_lo + cb_i) * TILE_W, TILE_W)
            # Rs[u][sigma] = source row base + u*8 + sigma: aligned loads
            # re-anchored by one dynamic sublane roll + select
            blks = [quads_ref[0, pl.ds(a0 + u * TILE_H, TILE_H),
                              pl.ds(col, TILE_W)]
                    for u in range(NCHAIN + 2)]
            rots = [pltpu.roll(bk, up, axis=0) for bk in blks]
            Rs = [jnp.where(in_lo, rots[u], rots[u + 1])
                  for u in range(NCHAIN + 1)]
            locs, hits = [], []
            for e in range(E):
                locs.append(jnp.clip(xls[e] - cb_i * TILE_W, 0, TILE_W - 1))
                hits.append((xls[e] >= cb_i * TILE_W)
                            & (xls[e] < (cb_i + 1) * TILE_W) & needs[e])
            out = list(gath)
            for j in range(ASPAN):
                # win[sigma] = source row base + j + sigma (static rolls)
                r0 = Rs[j // TILE_H]
                jm = j % TILE_H
                if jm == 0:
                    win = r0
                else:
                    r1 = Rs[j // TILE_H + 1]
                    win = jnp.where(s_iota < TILE_H - jm,
                                    pltpu.roll(r0, TILE_H - jm, axis=0),
                                    pltpu.roll(r1, TILE_H - jm, axis=0))
                for e in range(E):
                    g = jnp.take_along_axis(win, locs[e], axis=1)
                    out[e] = jnp.where((djs[e] == j) & hits[e], g, out[e])
            return out

        gath = jax.lax.fori_loop(0, n_cb, cb_body, gath)

        gi = a // Ag
        # conditioning shift: the group's first anchor ref intensity
        # (see kernels/deformable.py — NCC is shift-invariant; this keeps
        # the f32 moment accumulation O(spread) instead of O(mean^2))
        c0 = refa_ref[0, gi * Ag]
        Tn = 1 + n_extra
        for s in range(S):
            mom_sum = None
            for t in range(Tn):
                e = s * Tn + t
                g = gath[e]
                i00 = (g & 0xFF).astype(jnp.float32)
                i01 = ((g >> 8) & 0xFF).astype(jnp.float32)
                i10 = ((g >> 16) & 0xFF).astype(jnp.float32)
                i11 = ((g >> 24) & 0xFF).astype(jnp.float32)
                fx = fxs[e]
                fy = fys[e]
                src = ((i00 * (1 - fx) + i01 * fx) * (1 - fy)
                       + (i10 * (1 - fx) + i11 * fx) * fy) - c0
                need_f = needs[e].astype(jnp.float32)
                ref_e = ref_es[e] - c0
                w = w_es[e] * need_f
                # mom[1] counts USABLE ANCHORS (center only): tap samples
                # extend the group's moments, not its validity counting
                n_term = need_f if t == 0 else jnp.zeros_like(need_f)
                mom = jnp.stack(
                    [w, n_term, w * ref_e, w * ref_e * ref_e, w * src,
                     w * src * src, w * ref_e * src])           # [7, 8, 128]
                mom_sum = mom if mom_sum is None else mom_sum + mom
            acc_ref[s, gi] = acc_ref[s, gi] + mom_sum
            cnt = jnp.stack([needs[s * Tn].astype(jnp.float32),
                             oovs[s].astype(jnp.float32)])
            use_ref[s] = use_ref[s] + cnt
        return 0

    jax.lax.fori_loop(0, A, a_body, 0)

    for s in range(S):
        n_use = use_ref[s, 0]
        n_oov = use_ref[s, 1]
        c_num = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        n_sum = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        for gi in range(G):
            ac = acc_ref[s, gi]
            inv = 1.0 / jnp.maximum(ac[0], 1e-30)
            n_g = ac[1]
            m_ref = ac[2] * inv
            m_ref2 = ac[3] * inv
            m_src = ac[4] * inv
            m_src2 = ac[5] * inv
            m_rs = ac[6] * inv
            var_r = m_ref2 - m_ref * m_ref
            var_s = m_src2 - m_src * m_src
            cov = m_rs - m_ref * m_src
            ncc = cov / jnp.maximum(
                jnp.sqrt(jnp.maximum(var_r * var_s, 0.0)), 1e-30)
            cg = jnp.clip(1.0 - ncc, 0.0, COST_MAX)
            degenerate = (var_r < _K_MIN_VAR) | (var_s < _K_MIN_VAR)
            cg = jnp.where(degenerate | (n_g < _MIN_GROUP_SAMPLES),
                           COST_MAX, cg)
            c_num += cg * n_g
            n_sum += n_g
        c = c_num / jnp.maximum(n_sum, 1.0)
        c = jnp.where(n_use < _MIN_ANCHOR_SAMPLES, COST_MAX, c)
        tot = jnp.maximum(n_use + n_oov, 1.0)
        c = (c * n_use + COST_MAX * n_oov) / tot
        cost_ref[0, 0, s] = c
        has_ref[0, 0, s] = ((n_use + n_oov) > 0).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def anchor_slot_costs_pallas(
    packed_quads: jnp.ndarray,     # [V, H, W] int32 per-pixel 2x2 quads
    M: jnp.ndarray,                # [V, 3, 3]
    b: jnp.ndarray,                # [V, 3]
    src_wh: jnp.ndarray,           # [V, 2] f32 (w, h) extents
    slot_q: jnp.ndarray,           # [S, K, 3] f32 candidate q = n/w
    rax: jnp.ndarray,              # [A, K] f32 anchor ray x
    ray: jnp.ndarray,              # [A, K] f32 anchor ray y
    ref_a: jnp.ndarray,            # [A, K] f32 ref intensity at anchor
    w_col: jnp.ndarray,            # [A, K] f32 color weight
    vbits: jnp.ndarray,            # [A, K] int32 usable bitmask (valid&sees)
    tap_words: jnp.ndarray | None = None,   # [V, T-1, A, K] sample words
    cam_inv: jnp.ndarray | None = None,     # [2] f32 (inv_fx, inv_fy)
    interpret: bool = False,
) -> AnchorCostTerm:
    """Slot-exact anchor terms for all S slots at once: cost [S, K, V].

    With ``tap_words`` (PMStatic.anchor_taps > 1) each anchor serves
    1 + (T-1) gather entries per slot — center plus the reference's
    per-view sparse-patch candidate taps (deformable.py::gather_tap_words)
    — accumulated into the same grouped moments (~T x the gather cost)."""
    V, H, W = packed_quads.shape
    S, K = slot_q.shape[:2]
    A = rax.shape[0]
    G = max(A // _MIN_ANCHOR_SAMPLES, 1)
    Ag = -(-A // G)
    n_extra = 0 if tap_words is None else tap_words.shape[1]

    Kp = -(-K // KT_SIZE) * KT_SIZE
    KT = Kp // KT_SIZE
    Wp = -(-W // TILE_W) * TILE_W

    Hq = -(-(H + PAD_TOP + PAD_BOT) // TILE_H) * TILE_H
    quads_pad = jnp.pad(packed_quads,
                        ((0, 0), (PAD_TOP, Hq - H - PAD_TOP), (0, Wp - W)))

    def tile_k(x, fill=0):
        pad = [(0, 0)] * (x.ndim - 1) + [(0, Kp - K)]
        x = jnp.pad(x, pad, constant_values=fill)
        x = x.reshape(*x.shape[:-1], KT, TILE_H, TILE_W)
        return jnp.moveaxis(x, -3, 0)      # [KT, ..., 8, 128]

    rax_t = tile_k(rax)
    ray_t = tile_k(ray)
    refa_t = tile_k(ref_a)
    wcol_t = tile_k(w_col)
    vbits_t = tile_k(vbits)
    q_t = tile_k(jnp.moveaxis(slot_q, -1, 1))     # [KT, S, 3, 8, 128]

    mats = jnp.concatenate([M.reshape(V, 9), b], axis=1)      # [V, 12]

    grid = (V, KT)
    kern = functools.partial(_kernel, S=S, A=A, G=G, Ag=Ag,
                             H_src=H, W_src=W, Wp=Wp, n_extra=n_extra)
    ak_spec = pl.BlockSpec((1, A, TILE_H, TILE_W),
                           lambda v, kt: (kt, 0, 0, 0))
    ins = [mats, src_wh]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),        # mats [V,12]
                pl.BlockSpec(memory_space=pltpu.SMEM)]        # wh [V,2]
    if n_extra:
        # [V, T-1, A, K] -> [V, KT, T-1, A, 8, 128], block per (v, kt)
        taps_t = jnp.moveaxis(tile_k(tap_words), 0, 1)
        ins += [jnp.asarray(cam_inv, jnp.float32), taps_t]
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),            # cam [2]
            pl.BlockSpec((1, 1, n_extra, A, TILE_H, TILE_W),
                         lambda v, kt: (v, kt, 0, 0, 0, 0)),
        ]
    ins += [quads_pad, rax_t, ray_t, refa_t, wcol_t, vbits_t, q_t]
    in_specs += [
        pl.BlockSpec((1, Hq, Wp), lambda v, kt: (v, 0, 0)),
        ak_spec, ak_spec, ak_spec, ak_spec, ak_spec,
        pl.BlockSpec((1, S, 3, TILE_H, TILE_W),
                     lambda v, kt: (kt, 0, 0, 0, 0)),
    ]
    cost, has = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, S, TILE_H, TILE_W),
                         lambda v, kt: (v, kt, 0, 0, 0)),
            pl.BlockSpec((1, 1, S, TILE_H, TILE_W),
                         lambda v, kt: (v, kt, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((V, KT, S, TILE_H, TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((V, KT, S, TILE_H, TILE_W), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, G, 7, TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((S, 2, TILE_H, TILE_W), jnp.float32),
        ],
        interpret=interpret,
    )(*ins)

    # [V, KT, S, 8, 128] -> [S, K, V]
    def unshape(x):
        x = jnp.moveaxis(x, 0, -1)                 # [KT, S, 8, 128, V]
        x = jnp.moveaxis(x, 0, 1)                  # [S, KT, 8, 128, V]
        return x.reshape(S, Kp, V)[:, :K]

    return AnchorCostTerm(cost=unshape(cost), has_anchors=unshape(has) > 0)


def anchor_slot_costs_from_ctx(ctx, slot_planes_k, af_k, ok_k=None,
                               tap_words=None,
                               interpret: bool = False) -> AnchorCostTerm:
    """Adapter: build kernel inputs from a CostContext + compacted
    AnchorFields (same contract as mapping
    :func:`deformable.anchor_cost_term_for_plane` over the slot axis,
    including its ``tap_words`` sparse-patch extension).

    ``ok_k`` (bool [K]) marks real compacted pixels; overflow fill slots
    get zero usable-anchor bits so all-fill tiles skip their gather loops
    entirely (their outputs are discarded by the caller anyway)."""
    V = ctx.num_views
    w4 = slot_planes_k[..., 3:4]
    q = slot_planes_k[..., :3] / jnp.where(jnp.abs(w4) < 1e-12, 1e-12, w4)
    sees_bits = jnp.zeros(af_k.sees.shape[1:], jnp.int32)    # [A, K]
    for v in range(V):
        sees_bits = sees_bits | (af_k.sees[v].astype(jnp.int32) << v)
    vbits = jnp.where(af_k.valid, sees_bits, 0)
    if ok_k is not None:
        vbits = jnp.where(ok_k[None], vbits, 0)
    cam_inv = None
    if tap_words is not None:
        cam_inv = jnp.stack([jnp.asarray(ctx.inv_fx, jnp.float32),
                             jnp.asarray(ctx.inv_fy, jnp.float32)])
    return anchor_slot_costs_pallas(
        ctx.packed_quads, ctx.M, ctx.b, ctx.src_wh, q,
        af_k.rax, af_k.ray, af_k.ref_a, af_k.w_col, vbits,
        tap_words=tap_words, cam_inv=cam_inv,
        interpret=interpret)
