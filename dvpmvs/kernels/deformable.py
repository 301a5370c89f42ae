"""Deformable (weak-pixel) matching cost.

Oracle: ``ComputeBilateralNCCNew`` (APD.cu:835-1021): for a WEAK pixel,
cost = 0.25 * center-window NCC + 0.75 * mean over anchors of a 9-tap sparse
patch NCC at each (distant) strong anchor, gated per view by the anchor's
visibility; color-only bilateral weights throughout.

TPU adaptation (documented deviation): the per-anchor sparse patches require
A x 9 x V arbitrary gathers per (pixel, candidate) — beyond the TPU gather
budget at full grid resolution.  The production path instead evaluates a
grouped weighted NCC over the anchor *center* samples, warped by EACH
evaluated candidate plane's homography (:func:`anchor_cost_term_for_plane`
— candidate-dependent, the discrimination mechanism of
``ComputeBilateralNCCNew``), restricted to a compacted list of weak pixels
and served by the banded-gather kernel in ``anchor_pallas.py``.  Candidate
discrimination therefore comes from BOTH the exact center window and the
anchor term (0.25/0.75 blend); 1-tap anchor centers replace the 9-tap
sparse patches (the exact 9-tap oracle below quantifies the gap).  The
per-view visibility gating and out-of-view cost_max semantics follow the
reference.  :func:`anchor_cost_term` (a candidate-INDEPENDENT warp-field
variant, one term per half-iteration) is retained for A/B comparison; the
engine no longer uses it.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from .ncc import COST_MAX, CostContext, ncc_cost, warp_field
from .weak import AnchorResult

_MIN_ANCHOR_SAMPLES = 4
_MIN_GROUP_SAMPLES = 2   # per-group NCC validity (total gate stays at 4)
_K_MIN_VAR = 1e-5


class AnchorCostTerm(NamedTuple):
    cost: jnp.ndarray       # [H, W, V] anchor-part cost (cost_max fallback)
    has_anchors: jnp.ndarray  # [H, W, V] any usable anchor sample


def anchor_cost_term(
    ctx: CostContext,
    plane: jnp.ndarray,          # [H, W, 4] CURRENT plane field (full grid)
    af: "AnchorFields",
) -> AnchorCostTerm:
    """Weighted NCC over anchor-center samples of the current warp field.

    Computes directly on ``af``'s evaluation grid (checkerboard-packed in
    production) — the warp field is dense full-res (anchors index full-res
    positions) but the A-per-pixel anchor GATHERS, the dominant cost of
    this term, move only the active color's pixels."""
    H, W = plane.shape[:2]
    V = ctx.num_views
    if ctx.backend == "pallas" and ctx.packed_quads is not None:
        # identical warp-field semantics through the banded-gather kernel
        # (the XLA bilinear gather costs ~4 V HW slow-gather elements)
        from .sweep_pallas import warp_field_pallas
        n = plane[..., :3]
        w_d = plane[..., 3]
        w_d = jnp.where(jnp.abs(w_d) < 1e-12, 1e-12, w_d)
        invd = -(n[..., 0] * ctx.rx + n[..., 1] * ctx.ry + n[..., 2]) / w_d
        cam = jnp.stack([ctx.cam_cx, ctx.cam_cy,
                         jnp.asarray(ctx.inv_fx, jnp.float32),
                         jnp.asarray(ctx.inv_fy, jnp.float32)])
        warped, in_view = warp_field_pallas(
            invd, ctx.rx, ctx.packed_quads, ctx.M, ctx.b, cam, ctx.src_wh)
    else:
        warped, in_view = warp_field(ctx, plane)  # [V, H, W]

    idx = af.ay * W + af.ax                        # [A, H', W']
    ref_a = af.ref_a
    w_col = af.w_col
    valid = af.valid

    if ctx.backend == "pallas":
        # pack per-view data so the anchor gathers move 1+ceil(V/4)
        # elements per (anchor, pixel) instead of 3V — XLA gathers run at
        # ~86M elem/s on TPU and dominate this term.  Warp intensities
        # quantize to u8, 4 views per int32 (the same quantization the
        # packed-quad cost kernel applies to sources); in-view becomes a
        # per-pixel bitmask.
        wq = jnp.clip(jnp.round(warped), 0, 255).astype(jnp.int32)
        C = (V + 3) // 4
        packs = []
        for c in range(C):
            acc = jnp.zeros((H, W), jnp.int32)
            for j2 in range(4):
                v = 4 * c + j2
                if v < V:
                    acc = acc | (wq[v] << (8 * j2))
            packs.append(acc)
        inv_bits = jnp.zeros((H, W), jnp.int32)
        for v in range(V):
            inv_bits = inv_bits | (in_view[v].astype(jnp.int32) << v)

        pk_a = [p.reshape(-1)[idx] for p in packs]          # C x [A, H', W']
        invb_a = inv_bits.reshape(-1)[idx]
        src_a = jnp.stack([((pk_a[v // 4] >> (8 * (v % 4))) & 0xFF)
                           .astype(jnp.float32) for v in range(V)])
        inv_a = jnp.stack([((invb_a >> v) & 1).astype(bool)
                           for v in range(V)])
    else:
        src_a = jax.vmap(lambda wv: wv.reshape(-1)[idx])(warped)
        inv_a = jax.vmap(lambda iv: iv.reshape(-1)[idx])(in_view)
    sees = af.sees                                 # [V, A, H', W']
    usable = valid[None] & sees & inv_a            # contributes to NCC
    oov = valid[None] & sees & ~inv_a              # contributes cost_max

    w = jnp.where(usable, w_col[None], 0.0)        # [V, A, H', W']
    sw = jnp.sum(w, axis=1)
    n_use = jnp.sum(usable, axis=1)
    n_oov = jnp.sum(oov, axis=1)

    inv = 1.0 / jnp.maximum(sw, 1e-30)
    m_ref = jnp.sum(w * ref_a[None], axis=1) * inv
    m_ref2 = jnp.sum(w * ref_a[None] ** 2, axis=1) * inv
    m_src = jnp.sum(w * src_a, axis=1) * inv
    m_src2 = jnp.sum(w * src_a ** 2, axis=1) * inv
    m_rs = jnp.sum(w * ref_a[None] * src_a, axis=1) * inv

    var_r = m_ref2 - m_ref * m_ref
    var_s = m_src2 - m_src * m_src
    cov = m_rs - m_ref * m_src
    ncc = cov / jnp.maximum(jnp.sqrt(jnp.maximum(var_r * var_s, 0.0)), 1e-30)
    c = jnp.clip(1.0 - ncc, 0.0, COST_MAX)
    degenerate = (var_r < _K_MIN_VAR) | (var_s < _K_MIN_VAR)
    c = jnp.where(degenerate | (n_use < _MIN_ANCHOR_SAMPLES), COST_MAX, c)

    # blend in out-of-view anchors as cost_max (APD.cu:874-881)
    tot = jnp.maximum(n_use + n_oov, 1)
    c = (c * n_use + COST_MAX * n_oov) / tot
    has = (n_use + n_oov) > 0
    return AnchorCostTerm(cost=jnp.moveaxis(c, 0, -1),
                          has_anchors=jnp.moveaxis(has, 0, -1))


class AnchorFields(NamedTuple):
    """Per-evaluated-pixel anchor data, precomputed once per half-iteration
    (candidate-independent), on the evaluation grid (full or checkerboard-
    packed).  Anchor coordinates stay FULL-RES (they index full-res
    sources/ref)."""
    ax: jnp.ndarray         # [A, H', W'] int32 anchor x (full-res)
    ay: jnp.ndarray         # [A, H', W'] int32 anchor y
    rax: jnp.ndarray        # [A, H', W'] anchor ray x
    ray: jnp.ndarray        # [A, H', W'] anchor ray y
    valid: jnp.ndarray      # [A, H', W'] bool
    ref_a: jnp.ndarray      # [A, H', W'] ref intensity at anchor
    w_col: jnp.ndarray      # [A, H', W'] color weight vs evaluated pixel
    sees: jnp.ndarray       # [V, A, H', W'] anchor sees view v


def pack_anchor_fields(ctx: CostContext, anchors: AnchorResult,
                       sel_views: jnp.ndarray, ref_img: jnp.ndarray,
                       sigma_color, pk=lambda a: a) -> AnchorFields:
    """Precompute the candidate-independent parts of the per-plane anchor
    term; ``pk`` packs evaluation-grid fields to one checkerboard color
    (identity for dense evaluation)."""
    H, W = ref_img.shape
    V = ctx.num_views
    ax_f = jnp.clip(anchors.coords[..., 0], 0, W - 1)   # [A, H, W]
    ay_f = jnp.clip(anchors.coords[..., 1], 0, H - 1)
    pk_a = jax.vmap(pk)
    ax = pk_a(ax_f)
    ay = pk_a(ay_f)
    idx = ay * W + ax                                   # [A, H', W']
    ref_a = ref_img.reshape(-1)[idx]
    ref_c = pk(ref_img)
    w_col = jnp.exp(-jnp.abs(ref_a - ref_c[None])
                    / (2.0 * sigma_color * sigma_color))
    sel_bits = jnp.zeros((H, W), jnp.int32)
    for v in range(V):
        sel_bits = sel_bits | (sel_views[..., v].astype(jnp.int32) << v)
    selb_a = sel_bits.reshape(-1)[idx]
    sees = jnp.stack([((selb_a >> v) & 1).astype(bool) for v in range(V)])
    rax = (ax.astype(jnp.float32) - ctx.cam_cx) * ctx.inv_fx
    ray_ = (ay.astype(jnp.float32) - ctx.cam_cy) * ctx.inv_fy
    return AnchorFields(ax=ax, ay=ay, rax=rax, ray=ray_,
                        valid=pk_a(anchors.valid), ref_a=ref_a,
                        w_col=w_col, sees=sees)


# Reference fallback offsets for EMPTY patch-candidate slots (the fixed
# +-weak_radius grid, APD.cu:944-948; slot 8 = center is always served
# separately).  Order matches deformable_cost_exact's ``fallback``.
TAP_FALLBACK = np.array(
    [(-5, -5), (-5, 0), (-5, 5), (0, -5), (0, 5),
     (5, -5), (5, 0), (5, 5)], np.int32)


def pack_tap_fields(ref_img: jnp.ndarray, patch_off: jnp.ndarray,
                    n_extra: int) -> jnp.ndarray:
    """Dense per-anchor-position tap fields for the production tap mode.

    For an anchor AT pixel (x, y) of view v, tap t of
    ``PMStatic.anchor_taps`` reads 16 bits t of word [v, y, x]:
    ``(dy_eff+8) | (dx_eff+8) << 4 | round(ref[tap]) << 8`` where
    (dx_eff, dy_eff) is the patch-candidate offset (empty slots
    substituted with the reference's fixed grid, APD.cu:944-948) CLIPPED
    to the image — exactly ``deformable_cost_exact``'s tap positions.
    Built once per pass; per half-iteration one gather at the compacted
    anchor positions serves every tap (``gather_tap_words``).

    n_extra <= 2 (two 16-bit taps per int32 word).
    """
    assert 1 <= n_extra <= 2
    H, W = ref_img.shape
    V = patch_off.shape[0]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    refq = jnp.clip(jnp.round(ref_img), 0, 255).astype(jnp.int32)
    words = jnp.zeros((V, H, W), jnp.int32)
    for t in range(n_extra):
        off = patch_off[:, t].astype(jnp.int32)        # [V, H, W, 2]
        oi = off[..., 0]
        oj = off[..., 1]
        empty = (oi == 0) & (oj == 0)
        oi = jnp.where(empty, int(TAP_FALLBACK[t, 0]), oi)
        oj = jnp.where(empty, int(TAP_FALLBACK[t, 1]), oj)
        tx = jnp.clip(xs[None] + oi, 0, W - 1)
        ty = jnp.clip(ys[None] + oj, 0, H - 1)
        rq = refq.reshape(-1)[ty * W + tx]             # [V, H, W]
        word_t = ((ty - ys[None] + 8) | ((tx - xs[None] + 8) << 4)
                  | (rq << 8))
        words = words | (word_t << (16 * t))
    return words


def gather_tap_words(tap_fields: jnp.ndarray, af: "AnchorFields",
                     ref_c: jnp.ndarray, sigma_color, W: int,
                     n_extra: int) -> jnp.ndarray:
    """Per-(view, tap, anchor, pixel) sample words at compacted pixels.

    Gathers ``pack_tap_fields`` output at the anchor positions ([A, K]
    per view — ONE gather serves both taps), then attaches each tap's
    bilateral color weight against the evaluated pixel's intensity
    ``ref_c`` [K], quantized to u8 (the same quantization the packed-quad
    sources carry; the Pallas kernel and the XLA oracle unpack the SAME
    word, so they agree exactly).

    Returns [V, n_extra, A, K] int32:
    ``(dy+8) | (dx+8) << 4 | wq << 8 | refq << 16``.
    """
    sigma_color = jnp.asarray(sigma_color, jnp.float32)
    idx = af.ay * W + af.ax                            # [A, K]
    tw = tap_fields.reshape(tap_fields.shape[0], -1)[:, idx]  # [V, A, K]
    out = []
    for t in range(n_extra):
        sub = (tw >> (16 * t)) & 0xFFFF
        refq = (sub >> 8) & 0xFF
        w = jnp.exp(-jnp.abs(refq.astype(jnp.float32) - ref_c[None, None])
                    / (2.0 * sigma_color * sigma_color))
        wq = jnp.round(w * 255.0).astype(jnp.int32)
        out.append((sub & 0xFF) | (wq << 8) | (refq << 16))
    return jnp.stack(out, axis=1)


def unpack_tap_word(word: jnp.ndarray):
    """int32 sample word -> (dx, dy, weight f32 in [0,1], ref f32)."""
    dy = (word & 0xF) - 8
    dx = ((word >> 4) & 0xF) - 8
    w = ((word >> 8) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
    ref = ((word >> 16) & 0xFF).astype(jnp.float32)
    return dx, dy, w, ref


def anchor_fields_at(ctx: CostContext, anchors: AnchorResult,
                     sel_views: jnp.ndarray, ref_img: jnp.ndarray,
                     sigma_color, pk, gidx: jnp.ndarray) -> AnchorFields:
    """AnchorFields gathered directly at compacted evaluation-grid indices.

    ``gidx`` [K] indexes the flattened packed grid (one checkerboard
    color).  Skips the dense [A, H', W'] intermediate of
    :func:`pack_anchor_fields` — the per-pixel ref/selection gathers and
    the color-weight exp run at K compacted pixels instead of the whole
    grid (the weak minority is all the slot-exact term ever reads)."""
    H, W = ref_img.shape
    V = ctx.num_views
    pk_a = jax.vmap(pk)
    flatk = lambda x: x.reshape(*x.shape[:-2], -1)[..., gidx]
    ax = flatk(pk_a(jnp.clip(anchors.coords[..., 0], 0, W - 1)))   # [A, K]
    ay = flatk(pk_a(jnp.clip(anchors.coords[..., 1], 0, H - 1)))
    valid = flatk(pk_a(anchors.valid))
    idx = ay * W + ax
    ref_a = ref_img.reshape(-1)[idx]
    ref_c = pk(ref_img).reshape(-1)[gidx]
    w_col = jnp.exp(-jnp.abs(ref_a - ref_c[None])
                    / (2.0 * sigma_color * sigma_color))
    sel_bits = jnp.zeros((H, W), jnp.int32)
    for v in range(V):
        sel_bits = sel_bits | (sel_views[..., v].astype(jnp.int32) << v)
    selb_a = sel_bits.reshape(-1)[idx]
    sees = jnp.stack([((selb_a >> v) & 1).astype(bool) for v in range(V)])
    rax = (ax.astype(jnp.float32) - ctx.cam_cx) * ctx.inv_fx
    ray_ = (ay.astype(jnp.float32) - ctx.cam_cy) * ctx.inv_fy
    return AnchorFields(ax=ax, ay=ay, rax=rax, ray=ray_, valid=valid,
                        ref_a=ref_a, w_col=w_col, sees=sees)


def anchor_cost_term_for_plane(
    ctx: CostContext,
    plane_field: jnp.ndarray,        # [H', W', 4] the SLOT's plane field
    af: AnchorFields,
    tap_words: jnp.ndarray | None = None,   # [V, T-1, A, ...] sample words
) -> AnchorCostTerm:
    """Candidate-dependent anchor term (exact homography semantics).

    ``ComputeBilateralNCCNew`` (APD.cu:835-1021) warps each anchor patch by
    the homography of the plane being EVALUATED at the weak pixel — the
    candidate-plane dependence is what lets anchors discriminate hypotheses
    where the center window is textureless (the paper's core mechanism).
    :func:`anchor_cost_term` approximates this with the current field's warp
    at the anchor, which is candidate-INDEPENDENT; this variant computes the
    anchor-center sample under ``plane_field``'s homography taken at the
    evaluated pixel, restoring discrimination at anchor-center (1-tap)
    granularity.  Used for the 8 anchor-plane candidate slots and the
    current/fit slots (the weak recovery path); the 6 random-refinement
    proposals reuse the CURRENT plane's slot-exact term from this batch
    (slot 8) instead of re-warping per perturbation — the 11-sample anchor
    NCC is high-variance on random planes and re-warping rewards noise
    (engine/patchmatch.py, refinement-slot reuse; measured round 4).  Runs
    on the evaluation grid (checkerboard-packed in production: ``af``
    built with the pack fn).

    With ``tap_words`` (``PMStatic.anchor_taps`` > 1, see
    :func:`gather_tap_words`) each anchor contributes the reference's
    per-view sparse-patch candidate taps as EXTRA samples of its group's
    NCC, warped at the tap's own ray under the slot plane; sample
    positions and weights match ``deformable_cost_exact``'s taps, the
    grouping (vs the reference's per-anchor 9-tap NCC) is the documented
    deviation.  Anchor validity/visibility counting stays center-based.
    """
    H, W = ctx.shape
    V = ctx.num_views
    q = plane_field[..., :3] / jnp.where(
        jnp.abs(plane_field[..., 3:4]) < 1e-12, 1e-12,
        plane_field[..., 3:4])                         # [H', W', 3]
    q0 = q[None, ..., 0]
    q1 = q[None, ..., 1]
    q2 = q[None, ..., 2]

    def warp_sample(v, rax, ray_):
        """Clipped bilinear source sample + in-view test at ray (rax, ray_)
        under the slot plane of the evaluated pixel."""
        s_i = q0 * rax + q1 * ray_ + q2                # [A, H', W']
        M = ctx.M[v]
        b = ctx.b[v]
        hx = M[0, 0] * rax + M[0, 1] * ray_ + M[0, 2] - b[0] * s_i
        hy = M[1, 0] * rax + M[1, 1] * ray_ + M[1, 2] - b[1] * s_i
        hz = M[2, 0] * rax + M[2, 1] * ray_ + M[2, 2] - b[2] * s_i
        front = hz > 0
        hz = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
        px = hx / hz
        py = hy / hz
        in_view = ((px >= 0) & (px < ctx.src_wh[v, 0]) & (py >= 0)
                   & (py < ctx.src_wh[v, 1]) & front)
        if ctx.packed_quads is not None:
            # one packed-quad gather provides all four bilinear corners
            x0 = jnp.clip(jnp.floor(px), 0, W - 1).astype(jnp.int32)
            y0 = jnp.clip(jnp.floor(py), 0, H - 1).astype(jnp.int32)
            fx = jnp.clip(px, 0, W - 1) - x0
            fy = jnp.clip(py, 0, H - 1) - y0
            g = ctx.packed_quads[v].reshape(-1)[y0 * W + x0]
            i00 = (g & 0xFF).astype(jnp.float32)
            i01 = ((g >> 8) & 0xFF).astype(jnp.float32)
            i10 = ((g >> 16) & 0xFF).astype(jnp.float32)
            i11 = ((g >> 24) & 0xFF).astype(jnp.float32)
            src = ((i00 * (1 - fx) + i01 * fx) * (1 - fy)
                   + (i10 * (1 - fx) + i11 * fx) * fy)
        else:
            from .ncc import bilinear_sample
            src = bilinear_sample(ctx.src_imgs[v], px, py)
        return src, in_view

    src_list, inv_list = [], []
    for v in range(V):
        s, iv = warp_sample(v, af.rax, af.ray)
        src_list.append(s)
        inv_list.append(iv)
    src_a = jnp.stack(src_list)                        # [V, A, H', W']
    inv_a = jnp.stack(inv_list)

    usable = af.valid[None] & af.sees & inv_a
    oov = af.valid[None] & af.sees & ~inv_a
    w = jnp.where(usable, af.w_col[None], 0.0)

    # sample lists: center + optional sparse-patch taps (gated by the
    # CENTER's usability, sampled clipped — deformable_cost_exact's
    # convention: only the anchor center's in-view decides counting)
    n_extra = 0 if tap_words is None else tap_words.shape[1]
    w_samp = [w]
    ref_samp = [jnp.broadcast_to(af.ref_a[None], src_a.shape)]
    src_samp = [src_a]
    for t in range(n_extra):
        st_src, st_w, st_ref = [], [], []
        for v in range(V):
            dx, dy, wt, rt = unpack_tap_word(tap_words[v, t])
            rax_t = af.rax + dx.astype(jnp.float32) * ctx.inv_fx
            ray_t = af.ray + dy.astype(jnp.float32) * ctx.inv_fy
            s, _ = warp_sample(v, rax_t, ray_t)
            st_src.append(s)
            st_w.append(wt)
            st_ref.append(rt)
        w_samp.append(jnp.where(usable, jnp.stack(st_w), 0.0))
        ref_samp.append(jnp.broadcast_to(jnp.stack(st_ref), src_a.shape))
        src_samp.append(jnp.stack(st_src))
    Tn = n_extra + 1
    w_T = jnp.stack(w_samp, axis=2)                # [V, A, T, H', W']
    ref_T = jnp.stack(ref_samp, axis=2)
    src_T = jnp.stack(src_samp, axis=2)
    used_T = jnp.concatenate(
        [usable[:, :, None],
         jnp.zeros((V, usable.shape[1], n_extra) + usable.shape[2:], bool)],
        axis=2)

    # Mean of per-GROUP NCCs instead of one global NCC over every anchor
    # sample: the reference averages per-anchor 9-tap NCC costs
    # (APD.cu:988-1004), which caps any one bad anchor's influence at
    # cost_max/A — a single global NCC can be dragged arbitrarily by one
    # outlier sample.  Small groups of anchor centers are the closest
    # structure our 1-tap-per-anchor term supports (same gathers, only the
    # moment reductions restructure); measured on the textureless stress
    # band it recovers most of the remaining gap to the exact oracle.
    # The anchor axis PADS up to G*Ag (zero weight / unusable) so no real
    # anchor is dropped when A is not divisible by G.
    A = af.ax.shape[0]
    G = max(A // _MIN_ANCHOR_SAMPLES, 1)
    Ag = -(-A // G)
    a_pad = G * Ag - A
    # sample axis = (anchor-in-group, tap) flattened; element 0 of every
    # group is (first anchor, center) — the conditioning shift's origin
    shp = (V, G, Ag * Tn) + src_a.shape[2:]

    def grp(x):
        if a_pad:
            x = jnp.concatenate(
                [x, jnp.zeros((V, a_pad) + x.shape[2:], x.dtype)], axis=1)
        return x.reshape(shp)

    wg = grp(w_T)
    used_g = grp(used_T)
    ref_g = grp(ref_T)
    src_g = grp(src_T)
    # Conditioning: NCC is shift-invariant, and raw intensities (0..255)
    # lose ~5 of f32's 7 digits to cancellation in E[x^2] - E[x]^2 when the
    # group variance is small; shifting ref AND src by the group's first
    # anchor intensity makes the accumulated moments O(spread) instead of
    # O(mean^2).  The Pallas kernel (anchor_pallas.py) applies the SAME
    # shift so the two paths agree to float tolerance.
    c0 = ref_g[:, :, :1]
    ref_g = ref_g - c0
    src_g = src_g - c0
    sw = jnp.sum(wg, axis=2)
    n_g = jnp.sum(used_g, axis=2)
    inv = 1.0 / jnp.maximum(sw, 1e-30)
    m_ref = jnp.sum(wg * ref_g, axis=2) * inv
    m_ref2 = jnp.sum(wg * ref_g ** 2, axis=2) * inv
    m_src = jnp.sum(wg * src_g, axis=2) * inv
    m_src2 = jnp.sum(wg * src_g ** 2, axis=2) * inv
    m_rs = jnp.sum(wg * ref_g * src_g, axis=2) * inv

    var_r = m_ref2 - m_ref * m_ref
    var_s = m_src2 - m_src * m_src
    cov = m_rs - m_ref * m_src
    ncc = cov / jnp.maximum(jnp.sqrt(jnp.maximum(var_r * var_s, 0.0)), 1e-30)
    cg = jnp.clip(1.0 - ncc, 0.0, COST_MAX)               # [V, G, H', W']
    degenerate = (var_r < _K_MIN_VAR) | (var_s < _K_MIN_VAR)
    # Per-group validity gates on a SMALLER minimum than the total-sample
    # gate below: a pixel whose >= _MIN_ANCHOR_SAMPLES usable anchors are
    # spread thin across groups (e.g. 2+2) still gets real group costs.
    cg = jnp.where(degenerate | (n_g < _MIN_GROUP_SAMPLES), COST_MAX, cg)

    n_use = jnp.sum(usable, axis=1)
    n_oov = jnp.sum(oov, axis=1)
    # sample-weighted mean of group costs, then blend OOV anchors as
    # cost_max (APD.cu:874-881)
    c = (jnp.sum(cg * n_g, axis=1)
         / jnp.maximum(jnp.sum(n_g, axis=1), 1))
    c = jnp.where(n_use < _MIN_ANCHOR_SAMPLES, COST_MAX, c)
    tot = jnp.maximum(n_use + n_oov, 1)
    c = (c * n_use + COST_MAX * n_oov) / tot
    has = (n_use + n_oov) > 0
    return AnchorCostTerm(cost=jnp.moveaxis(c, 0, -1),
                          has_anchors=jnp.moveaxis(has, 0, -1))


def deformable_cost(
    ctx_yzl: CostContext,
    plane_candidate: jnp.ndarray,    # [H', W', 4]
    anchor_term: AnchorCostTerm,
    parity=None,
) -> jnp.ndarray:
    """0.25 * center-window NCC (color-only weights) + 0.75 * anchor term.

    With ``parity`` everything (ctx fields, candidate planes, anchor term)
    lives on the checkerboard-packed half grid."""
    center = ncc_cost(ctx_yzl, plane_candidate, parity=parity)  # [H',W',V]
    return jnp.where(anchor_term.has_anchors,
                     0.25 * center + 0.75 * anchor_term.cost,
                     center)


def deformable_cost_exact(
    ctx_yzl: CostContext,
    plane_candidate: jnp.ndarray,    # [H, W, 4] full-res candidate field
    anchors: AnchorResult,
    patch_off: jnp.ndarray,          # [V, 8, H, W, 2] patch_candidates()
    sel_views: jnp.ndarray,          # [H, W, V]
    ref_img: jnp.ndarray,
    sigma_color,
) -> jnp.ndarray:
    """EXACT ``ComputeBilateralNCCNew`` (APD.cu:835-1021): per-anchor 9-tap
    sparse-patch NCC with the anchor's per-view candidate offsets, all warped
    through the CANDIDATE plane's homography.

    This is the reference-faithful oracle for the warp-field approximation in
    :func:`anchor_cost_term`/:func:`deformable_cost` — gather-bound
    (A x 9 x V arbitrary samples per pixel), intended for accuracy
    quantification on small scenes (tests/test_deformable_exact.py), not the
    production path.  Faithfully reproduced quirks: visible-but-unselected
    anchors contribute cost_max (the reference's 0-weight NaN collapses to
    cost_max through CUDA fminf), zero-offset slots fall back to the +-5
    grid, slot 8 is the anchor center.
    """
    H, W = ref_img.shape
    V = ctx_yzl.num_views
    A = anchors.coords.shape[0]
    sigma_color = jnp.asarray(sigma_color, jnp.float32)

    q = plane_candidate[..., :3] / jnp.where(
        jnp.abs(plane_candidate[..., 3:4]) < 1e-12, 1e-12,
        plane_candidate[..., 3:4])                     # [H, W, 3]

    def warp(v, tx, ty):
        """Source position of ref pixel (tx, ty) (int grids) under the
        candidate plane of the EVALUATED pixel."""
        tidx = ty * W + tx
        rx = ctx_yzl.rx.reshape(-1)[tidx]
        ry = ctx_yzl.ry.reshape(-1)[tidx]
        M = ctx_yzl.M[v]
        b = ctx_yzl.b[v]
        s = q[..., 0] * rx + q[..., 1] * ry + q[..., 2]
        hx = M[0, 0] * rx + M[0, 1] * ry + M[0, 2] - b[0] * s
        hy = M[1, 0] * rx + M[1, 1] * ry + M[1, 2] - b[1] * s
        hz = M[2, 0] * rx + M[2, 1] * ry + M[2, 2] - b[2] * s
        hz = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
        return hx / hz, hy / hz, hz > 0

    def sample(img, px, py):
        x0 = jnp.clip(jnp.floor(px), 0, W - 1).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(py), 0, H - 1).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, W - 1)
        y1 = jnp.minimum(y0 + 1, H - 1)
        fxs = jnp.clip(px, 0, W - 1) - x0
        fys = jnp.clip(py, 0, H - 1) - y0
        g = lambda yy, xx: img.reshape(-1)[yy * W + xx]
        top = g(y0, x0) * (1 - fxs) + g(y0, x1) * fxs
        bot = g(y1, x0) * (1 - fxs) + g(y1, x1) * fxs
        return top * (1 - fys) + bot * fys

    fallback = jnp.asarray(
        [(-5, -5), (-5, 0), (-5, 5), (0, -5), (0, 5),
         (5, -5), (5, 0), (5, 5), (0, 0)], jnp.int32)   # slot 8 = center

    ref_center = ref_img                                 # [H, W] at p
    src_whx = ctx_yzl.src_wh[:, 0]
    src_why = ctx_yzl.src_wh[:, 1]

    def anchor_view_cost(a, v):
        ax = jnp.clip(anchors.coords[a, ..., 0], 0, W - 1)
        ay = jnp.clip(anchors.coords[a, ..., 1], 0, H - 1)
        valid = anchors.valid[a]
        aidx = ay * W + ax
        sees = sel_views.reshape(-1, V)[aidx][..., v]
        # anchor-center warp in-view test (per the evaluated pixel's plane)
        sx, sy, front = warp(v, ax, ay)
        in_view = ((sx >= 0) & (sx < src_whx[v]) & (sy >= 0)
                   & (sy < src_why[v]) & front)

        sums = [jnp.zeros((H, W), jnp.float32) for _ in range(6)]
        for k in range(9):
            if k < 8:
                off = patch_off[v, k].reshape(-1, 2)[aidx]   # [H, W, 2]
                oi = off[..., 0].astype(jnp.int32)
                oj = off[..., 1].astype(jnp.int32)
                empty = (oi == 0) & (oj == 0)
                oi = jnp.where(empty, fallback[k, 0], oi)
                oj = jnp.where(empty, fallback[k, 1], oj)
            else:
                oi = jnp.zeros((H, W), jnp.int32)
                oj = jnp.zeros((H, W), jnp.int32)
            tx = jnp.clip(ax + oi, 0, W - 1)
            ty = jnp.clip(ay + oj, 0, H - 1)
            ref_pix = ref_img.reshape(-1)[ty * W + tx]
            px, py, _ = warp(v, tx, ty)
            src_pix = sample(ctx_yzl.src_imgs[v], px, py)
            wgt = jnp.exp(-jnp.abs(ref_pix - ref_center)
                          / (2.0 * sigma_color * sigma_color))
            sums[0] += wgt * ref_pix
            sums[1] += wgt * ref_pix * ref_pix
            sums[2] += wgt * src_pix
            sums[3] += wgt * src_pix * src_pix
            sums[4] += wgt * ref_pix * src_pix
            sums[5] += wgt
        inv = 1.0 / jnp.maximum(sums[5], 1e-30)
        m_r, m_r2 = sums[0] * inv, sums[1] * inv
        m_s, m_s2 = sums[2] * inv, sums[3] * inv
        m_rs = sums[4] * inv
        var_r = m_r2 - m_r * m_r
        var_s = m_s2 - m_s * m_s
        cov = m_rs - m_r * m_s
        ncc = cov / jnp.maximum(jnp.sqrt(jnp.maximum(var_r * var_s, 0.0)),
                                1e-30)
        c = jnp.clip(1.0 - ncc, 0.0, COST_MAX)
        c = jnp.where((var_r < _K_MIN_VAR) | (var_s < _K_MIN_VAR),
                      COST_MAX, c)
        # reference counting: in-view anchors count (unselected ones as
        # cost_max via the NaN quirk); OOV anchors count cost_max only when
        # they see the view; everything else is skipped
        counted = valid & (in_view | sees)
        contrib = jnp.where(in_view & sees, c, COST_MAX)
        return jnp.where(counted, contrib, 0.0), counted

    center = ncc_cost(ctx_yzl, plane_candidate)          # [H, W, V]

    out = []
    for v in range(V):
        # fori over anchors, NOT a python unroll: the unrolled oracle
        # graph (A x 9 taps x V warp/gather blocks, ~300 at A=11 V=3)
        # measured multi-minute XLA:CPU compiles and segfaulted the
        # compiler on the battery's larger scenes (round 5); the loop
        # preserves the accumulation order exactly.
        def a_body(a, carry, v=v):
            acc, cnt = carry
            c, ok = anchor_view_cost(a, v)
            return acc + c, cnt + ok
        acc, cnt = jax.lax.fori_loop(
            0, A, a_body, (jnp.zeros((H, W), jnp.float32),
                           jnp.zeros((H, W), jnp.int32)))
        strong = jnp.minimum(acc / jnp.maximum(cnt, 1), COST_MAX)
        cv = center[..., v]
        out.append(jnp.where(cnt > 0, 0.25 * cv + 0.75 * strong, cv))
    return jnp.stack(out, axis=-1)
