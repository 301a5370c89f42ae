"""The per-view PatchMatch pass (jitted state machine).

Re-creates the kernel sequence of ``APD::RunPatchMatch`` (APD.cu:4406-4532)
as one functional, jit-compiled program over a ``PMState`` pytree:

    init (plane encode / random init + initial cost & view selection)
    [use_APD] detail demotion, complexity, anchor generation + reliability
    for iter in range(max_iterations):
        for color in (black, red):
            strong propagation -> MHJVS -> adoption -> 6-plane refinement
        [use_APD] RANSAC fit planes, then per color:
            weak propagation over the 8 anchor planes (deformable cost,
            geometric consistency) -> fit-plane test -> refinement
    plane -> (depth, world normal);  checkerboard median filter
    DepthToWeak reclassification;  LocalRefine polish

Differences from the CUDA design (deliberate, TPU-first):
  * dense masked updates instead of per-color kernel launches — each
    half-iteration computes proposals for every pixel and commits only its
    color (the checkerboard data dependence is preserved exactly);
  * counter-based ``jax.random`` keyed on (iteration, color, site) instead of
    clock-seeded curand — runs are reproducible;
  * FIRST_INIT re-encodes prior planes into compute form (the reference keeps
    the (world-normal, depth) encoding and feeds it to the homography —
    SURVEY §2.5-class bug, not reproduced);
  * the deformable cost's anchor part is a grouped anchor-center NCC warped
    per evaluated candidate (slot-exact), computed at a compacted band-major
    list of weak pixels (see kernels/deformable.py, kernels/anchor_pallas.py);
    weak pixels beyond the compaction budget keep the center-window cost;
  * the adaptive radius map is frozen within a pass (the reference mutates
    it mid-pass from RANSACToGetFitPlane); the updated map feeds the next
    pass.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import PMDynamic, PMStatic, PixelState, RunState
from ..geometry.camera import Camera
from ..geometry.transforms import depth_from_plane, plane_from_world
from ..kernels.deformable import deformable_cost_exact
from ..kernels.geom import GeomContext, build_geom_context, geom_consistency_cost
from ..kernels.median import median_filter_depth
from ..kernels.ncc import (COST_MAX, CostContext, build_cost_context,
                           ncc_cost, ncc_cost_batch)
from ..kernels.propagation import (edge_candidate_merge, judge_extend, mhjvs,
                                   neighbor_prior, select_candidates,
                                   select_candidates_edge, tile_plane_mask,
                                   tile_view_mask, weighted_cost)
from ..kernels.refine import refinement_planes
from ..kernels.sampling import (plane_from_normal_depth, random_depth,
                                visibility_prior_normal)
from ..kernels.sweep import depth_to_weak, local_refine
from ..kernels.weak import (AnchorResult, demote_detail, edge_complexity,
                            edge_ray_distance, find_anchors,
                            label_boundary_distance, ransac_fit_plane)
from ..kernels.gatherfree import take0
from .packing import pack_ctx, pack_parity, unpack_parity
from .state import PMState, PassOutput


def _grids(H, W):
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    return xs, ys


def _ray(rx, ry):
    r = jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)
    return r / jnp.linalg.norm(r, axis=-1, keepdims=True)


def _initial_cost_first(ctx: CostContext, plane, top_k: int):
    """ComputeMultiViewInitialCostandSelectedViews (APD.cu:1115-1161).

    Top-k by iterative min extraction (k is tiny) — a sort over the minor V
    axis plus a take_along_axis is pathologically slow on TPU."""
    costs = ncc_cost(ctx, plane)                       # [H, W, V]
    V = costs.shape[-1]
    num_valid = jnp.sum(costs < COST_MAX, axis=-1)
    k = jnp.minimum(num_valid, top_k)                  # [H, W]
    work = costs
    total = jnp.zeros(costs.shape[:2], jnp.float32)
    thresh = jnp.full(costs.shape[:2], COST_MAX, jnp.float32)
    ar = jnp.arange(V)
    for i in range(top_k):
        m = jnp.min(work, axis=-1)
        total = total + jnp.where(i < k, m, 0.0)
        thresh = jnp.where(i == k - 1, m, thresh)
        hit = ar[None, None, :] == jnp.argmin(work, axis=-1)[..., None]
        work = jnp.where(hit, jnp.inf, work)
    mean_topk = total / jnp.maximum(k, 1)
    sel = (costs <= thresh[..., None]) & (k[..., None] > 0)
    cost = jnp.where(k > 0, mean_topk, COST_MAX)
    return cost, sel


def _initial_cost_refine(ctx: CostContext, plane, sel_views):
    """ComputeMultiViewInitialCost (APD.cu:1163-1191): mean over selected
    views with cost < max; failing views are unselected."""
    costs = ncc_cost(ctx, plane)
    ok = sel_views & (costs < COST_MAX)
    cnt = jnp.sum(ok, axis=-1)
    cost = jnp.sum(jnp.where(ok, costs, 0.0), axis=-1) / jnp.maximum(cnt, 1)
    return jnp.where(cnt > 0, cost, COST_MAX), ok


def _geom_vec(gctx, plane, xs, ys, ref_cam):
    depth = depth_from_plane(plane, xs, ys, ref_cam)
    return geom_consistency_cost(gctx, depth)


def _geom_batch(gctx, planes, xs, ys, ref_cam, backend, parity=None):
    """Geom cost of K candidate plane fields -> [K, H', W', V].

    One batched Pallas call on TPU (the per-candidate source-depth lookup is
    an XLA gather otherwise — the dominant cost of geometric passes).  With
    ``parity`` the planes/coords live on the checkerboard-packed grid."""
    depths = jax.vmap(lambda p: depth_from_plane(p, xs, ys, ref_cam))(planes)
    if backend == "pallas":
        from ..kernels.geom_pallas import geom_cost_pallas
        return geom_cost_pallas(gctx, depths, parity=parity)
    assert parity is None
    return jax.vmap(lambda d: geom_consistency_cost(gctx, d))(depths)


def _propagate_color_strong(
    state: PMState, color: int, it, key, ctx, ctx_pk, ref_cam, src_cams,
    static: PMStatic, dyn: PMDynamic, xs, ys, rx, ry, ray, parity,
    edge=None, edge_dist=None,
):
    """One strong half-iteration (one checkerboard color).

    All cost evaluations, MHJVS and refinement run on the checkerboard-
    packed half grid (the red-black scheme can only write this color's
    pixels, APD.cu:3127-3165); candidate selection stays full-res (cheap
    static shifts) and the result scatters back at commit.

    With an edge map (``use_edge``, the reference's permanent default) the
    candidate set comes from the edge-adaptive dual scan (APD.cu:2038-2140);
    otherwise the ACMM-style scan plus up to ``static.extend_rounds``
    extended far-propagation rounds (APD.cu:1385-1895, 2386-2460) runs.
    """
    k_view, k_refine = jax.random.split(jax.random.fold_in(key, color))
    use_pk = ctx_pk is not None
    pk = (lambda a: pack_parity(a, color)) if use_pk else (lambda a: a)
    par = color if use_pk else None
    ctx_c = ctx_pk if use_pk else ctx
    fused = ctx.backend == "pallas"

    use_edge_branch = (static.use_edge and edge is not None
                       and edge_dist is not None)
    if use_edge_branch:
        # edge-adaptive dual scan: adaptive + short-range candidates, then
        # the good/bad view-count comparison on their NCC vectors
        (cand1_f, flags1_f, cand2_f, flags2_f,
         differs_f) = select_candidates_edge(
            state.plane, state.cost, edge, edge_dist)
        prior = pk(neighbor_prior(state.sel_views, flags1_f))
        cand1 = jax.vmap(pk)(cand1_f)
        cand2 = jax.vmap(pk)(cand2_f)
        flags1 = jax.vmap(pk)(flags1_f)
        flags2 = jax.vmap(pk)(flags2_f)
        differs = jax.vmap(pk)(differs_f)
        edge_c = pk(edge.astype(bool))
        # one 17-plane batch: adaptive(8) + short(8) + current(1); the
        # short-scan planes are tile-masked to where they picked a
        # different source pixel than the adaptive scan
        always = jnp.ones_like(differs[:1]).repeat(8, axis=0)
        pmask = (tile_plane_mask(jnp.concatenate(
            [always, differs, always[:1]])) if fused else None)
        cost_all = ncc_cost_batch(
            ctx_c,
            jnp.concatenate([cand1, cand2, pk(state.plane)[None]], axis=0),
            parity=par, plane_mask=pmask)
        cost_array, cand_planes, flags = edge_candidate_merge(
            edge_c, flags1, flags2, differs, cost_all[:8], cost_all[8:16],
            cand1, cand2, it)
        cur_vec = cost_all[16]
    else:
        cand_f, flags_f, mapc_f = select_candidates(
            state.plane, state.cost, ray)
        prior = pk(neighbor_prior(state.sel_views, flags_f))
        cand_planes = jax.vmap(pk)(cand_f)
        flags = jax.vmap(pk)(flags_f)
        # candidates + current plane in ONE batched evaluation (the fused
        # Pallas backend amortizes weights/warp setup across the batch)
        cost_all = ncc_cost_batch(
            ctx_c,
            jnp.concatenate([cand_planes, pk(state.plane)[None]], axis=0),
            parity=par)
        cost_array = cost_all[:8]                          # [8, H', W', V]
        cur_vec = cost_all[8]
        if static.extend_rounds > 0:
            # extended far propagation: re-scan pushed offsets while the
            # direction's candidate stays bad (JudgeExtend); replacement is
            # decided on the cost map, fresh NCC only for replaced tiles.
            # Deviations (documented): strict < replacement (ties keep the
            # old candidate; the reference re-adopts and re-evaluates the
            # identical plane on <=), and tile-granular NCC refresh.
            mapc = jax.vmap(pk)(mapc_f)
            active = flags
            for e in range(min(static.extend_rounds, 3)):
                active = judge_extend(it, e, cost_array, active)
                ext_f, ext_ok_f, ext_map_f = select_candidates(
                    state.plane, state.cost, ray, extend_round=e)
                ext_p = jax.vmap(pk)(ext_f)
                ext_ok = jax.vmap(pk)(ext_ok_f)
                ext_map = jax.vmap(pk)(ext_map_f)
                rep = active & ext_ok & (ext_map < mapc)
                cand_planes = jnp.where(rep[..., None], ext_p, cand_planes)
                mapc = jnp.where(rep, ext_map, mapc)
                pm = tile_plane_mask(rep) if fused else None
                ca_new = ncc_cost_batch(ctx_c, cand_planes, parity=par,
                                        plane_mask=pm)
                cost_array = jnp.where(rep[..., None], ca_new, cost_array)

    view_weights, temp_sel, weight_norm = mhjvs(
        k_view, cost_array, flags, prior, it,
        num_samples=static.view_samples)
    final_costs = weighted_cost(cost_array, view_weights[None],
                                weight_norm[None])          # [8, H', W']
    cost0 = weighted_cost(cur_vec, view_weights, weight_norm)

    xs_c, ys_c, rx_c, ry_c = pk(xs), pk(ys), pk(rx), pk(ry)

    # adopt best direction candidate (APD.cu:2544-2567)
    min_idx = jnp.argmin(final_costs, axis=0)
    best_cost = take0(final_costs, min_idx)
    best_plane = take0(cand_planes, min_idx)
    best_flag = take0(flags, min_idx)
    depth_before = depth_from_plane(best_plane, xs_c, ys_c, ref_cam)
    adopt = (best_flag & (depth_before >= dyn.depth_min)
             & (depth_before <= dyn.depth_max) & (best_cost < cost0))

    plane_cur = pk(state.plane)
    sel_cur = pk(state.sel_views)
    plane_now = jnp.where(adopt[..., None], best_plane, plane_cur)
    cost_now = jnp.where(adopt, best_cost, cost0)
    sel_now = jnp.where(adopt[..., None], temp_sel, sel_cur)

    # 6-plane refinement (APD.cu:1311-1383) — weighted by the MC view
    # weights, so zero-weight views are skipped exactly via the tile mask
    cur_depth = depth_from_plane(plane_now, xs_c, ys_c, ref_cam)
    ref_planes = refinement_planes(
        k_refine, plane_now[..., :3], cur_depth, sel_now, rx_c, ry_c,
        xs_c, ys_c, ref_cam, src_cams, dyn.depth_min, dyn.depth_max)
    vmask = (tile_view_mask(view_weights) if ctx.backend == "pallas"
             else None)
    ref_costs_v = ncc_cost_batch(ctx_c, ref_planes, parity=par,
                                 view_mask=vmask)          # [6, H', W', V]
    ref_costs = weighted_cost(ref_costs_v, view_weights[None],
                              weight_norm[None])            # [6, H', W']
    ref_depths = jax.vmap(lambda p: depth_from_plane(p, xs_c, ys_c, ref_cam))(
        ref_planes)
    ref_ok = (ref_depths >= dyn.depth_min) & (ref_depths <= dyn.depth_max)
    ref_costs = jnp.where(ref_ok, ref_costs, jnp.inf)
    rmin = jnp.argmin(ref_costs, axis=0)
    rcost = take0(ref_costs, rmin)
    rplane = take0(ref_planes, rmin)
    take_ref = rcost < cost_now
    plane_now = jnp.where(take_ref[..., None], rplane, plane_now)
    cost_now = jnp.where(take_ref, rcost, cost_now)

    # writeback gate (APD.cu:2727-2736)
    if static.state == RunState.REFINE_INIT:
        improved = cost_now < cost0 - 0.1
        plane_new = jnp.where(improved[..., None], plane_now, plane_cur)
        cost_new = jnp.where(improved, cost_now, cost0)
    else:
        plane_new = plane_now
        cost_new = cost_now

    if use_pk:
        upk = lambda p, o: unpack_parity(p, color, o)
        plane_new = upk(plane_new, state.plane)
        cost_new = upk(cost_new, state.cost)
        sel_now = upk(sel_now, state.sel_views)
        view_weights = upk(view_weights, state.view_weights)

    mask = (parity == color) & (state.weak != PixelState.WEAK)
    m1 = mask[..., None]
    return state.replace(
        plane=jnp.where(m1, plane_new, state.plane),
        cost=jnp.where(mask, cost_new, state.cost),
        sel_views=jnp.where(m1, sel_now, state.sel_views),
        view_weights=jnp.where(m1, view_weights, state.view_weights),
    )


_BAND_LANES = 128   # compaction band width (packed lanes); see _band_compact


def _weak_budget(SZ: int, frac: float) -> int:
    """Compaction budget K_w: frac of the evaluation grid, rounded up to a
    lane multiple (128), floored at one tile, capped at the grid."""
    K_w = max(-(-int(SZ * frac) // 128) * 128, 128)
    return min(K_w, SZ)


def _band_compact(weak_pk: jnp.ndarray, K_w: int):
    """Compacted weak-pixel indices in BAND-MAJOR order.

    Raster-order compaction makes every 1024-pixel kernel tile span the
    full image width, so the anchor kernel's dynamic gather windows cover
    ~7 column blocks and (under camera roll, slope ~W*sin(theta)) ~46
    source rows (measured round 4, bench geometry).  Enumerating weak
    pixels within vertical bands of ``_BAND_LANES`` packed columns first
    bounds each tile's spatial extent to the band width: windows shrink to
    ~2-3 column blocks and the roll term drops by W/band.  The order is
    just a permutation of the compacted list — every consumer (anchor
    field gathers, scatters through ``flat_idx``) is order-invariant.

    Returns (flat_idx [K_w] raster flat indices with SZ as the overflow
    fill, ok_k validity mask).
    """
    Hc, Wc = weak_pk.shape
    SZ = Hc * Wc
    band = min(_BAND_LANES, Wc)
    nb = -(-Wc // band)
    Wp = nb * band
    SZp = Hc * Wp
    wpad = jnp.pad(weak_pk, ((0, 0), (0, Wp - Wc)))
    mask_bm = wpad.reshape(Hc, nb, band).transpose(1, 0, 2).reshape(-1)
    p = jnp.nonzero(mask_bm, size=K_w, fill_value=SZp)[0]
    ok_k = p < SZp
    b, rem = p // (Hc * band), p % (Hc * band)
    r, c = rem // band, rem % band
    flat_idx = jnp.where(ok_k, r * Wc + jnp.minimum(b * band + c, Wc - 1),
                         SZ)
    return flat_idx, ok_k


def _propagate_color_weak(
    state: PMState, anchors: AnchorResult, fit_plane: jnp.ndarray,
    color: int, it, key, ctx, ctx_pk, ctx_yzl, ctx_yzl_pk, gctx,
    ref_img, ref_cam, src_cams,
    static: PMStatic, dyn: PMDynamic, xs, ys, rx, ry, parity,
    patch_off=None, tap_fields=None,
):
    """One weak half-iteration (CheckerboardPropagationWeak, APD.cu:2739-3089).

    Like the strong path, all cost/geom evaluations, MHJVS and refinement run
    on the checkerboard-packed half grid when the pallas contexts are
    available; anchor terms compute on the packed grid too (the warp field
    is dense full-res, but the per-anchor gathers — the dominant cost —
    index only the active color's pixels).
    """
    H, W = ref_img.shape
    V = ctx.num_views
    k_view, k_refine = jax.random.split(
        jax.random.fold_in(jax.random.fold_in(key, color), 7))

    exact = static.exact_deformable and patch_off is not None
    use_pk = ctx_pk is not None and not exact
    pk = (lambda a: pack_parity(a, color)) if use_pk else (lambda a: a)
    par = color if use_pk else None
    ctx_c = ctx_pk if use_pk else ctx
    ctx_yzl_c = ctx_yzl_pk if use_pk else ctx_yzl

    if exact:
        # reference-faithful per-anchor sparse-patch cost (oracle mode)
        deform = lambda pl_: deformable_cost_exact(
            ctx_yzl, pl_, anchors, patch_off, state.sel_views, ref_img,
            dyn.sigma_color)
        deform_slot = deform
    else:
        # Weak-pixel compaction: the slot-exact anchor term (per-slot x
        # A x V gathers per pixel) only affects pixels that can COMMIT —
        # weak ones, a minority.  Gather their indices into a fixed-size
        # band-major list (budget = half the evaluation grid), compute the
        # term on the list, scatter over the center-only base.  EVERY
        # in-budget slot — the 8 anchor-plane candidates, current, fit,
        # and the 6 refinement proposals — carries the candidate-DEPENDENT
        # anchor term (ComputeBilateralNCCNew semantics, APD.cu:835-1021);
        # weak pixels beyond the budget fall back to the center-window
        # cost alone (graceful; weak fractions after demotion are far
        # below the 50% budget).
        from ..kernels.deformable import (anchor_cost_term_for_plane,
                                          anchor_fields_at)
        weak_pk = pk(state.weak == PixelState.WEAK)
        SZ = weak_pk.size
        K_w = _weak_budget(SZ, static.weak_budget_frac)
        flat_idx, ok_k = _band_compact(weak_pk, K_w)
        gidx = jnp.minimum(flat_idx, SZ - 1)
        af_k = anchor_fields_at(ctx_yzl, anchors, state.sel_views, ref_img,
                                dyn.sigma_color, pk, gidx)
        # Weak-tile restriction: every cost this half-iteration computes
        # commits ONLY at weak pixels (the trailing mask), so 8x128 tiles
        # without a single weak pixel skip the center-window NCC batches
        # entirely — the reference launches its weak kernels on the weak
        # list only (APD.cu:2739-2744).  Skipped tiles read COST_MAX;
        # every consumer is discarded at non-weak pixels by the commit.
        wt01 = (tile_plane_mask(weak_pk[None])
                if ctx_yzl.backend == "pallas" else None)
        pmask_s = (lambda S_: None if wt01 is None
                   else wt01 * ((1 << S_) - 1))
        tap_w = None
        if tap_fields is not None:
            # sparse-patch tap mode (PMStatic.anchor_taps > 1): one gather
            # at the compacted anchor positions serves every per-view tap
            from ..kernels.deformable import gather_tap_words
            ref_c_k = pk(ref_img).reshape(-1)[gidx]
            tap_w = gather_tap_words(tap_fields, af_k, ref_c_k,
                                     dyn.sigma_color, W,
                                     static.anchor_taps - 1)

        def _scatter_blend(centers, ck):
            ck = jnp.where(ok_k[None, :, None], ck, 0.0)
            out = jax.vmap(lambda b, c: b.reshape(SZ, -1)
                           .at[flat_idx].set(c, mode="drop"))(centers, ck)
            return out.reshape(centers.shape)

        def deform_slots_batched(slot_planes):
            """Slot costs with the candidate-dependent anchor term: center
            windows run as ONE fused NCC batch (single-plane calls waste
            the kernel's batch amortization); anchor terms compute at the
            compacted weak pixels and scatter over the center base.
            Returns the blended dense costs plus the compacted anchor term
            (reused for the refinement slots)."""
            S = slot_planes.shape[0]
            centers = ncc_cost_batch(ctx_yzl_c, slot_planes, parity=par,
                                     plane_mask=pmask_s(S))
            pl_k = slot_planes.reshape(S, SZ, 4)[:, gidx]
            if (ctx_yzl.backend == "pallas"
                    and ctx_yzl.packed_quads is not None):
                # banded-gather kernel: serves the S x A x V x K anchor
                # gathers from VMEM-resident sources (XLA's one-element
                # gathers dominate the REFINE pass otherwise)
                from ..kernels.anchor_pallas import anchor_slot_costs_from_ctx
                at_k = anchor_slot_costs_from_ctx(ctx_yzl, pl_k, af_k,
                                                  ok_k=ok_k,
                                                  tap_words=tap_w)
            else:
                at_k = jax.lax.map(
                    lambda p: anchor_cost_term_for_plane(ctx_yzl, p, af_k,
                                                         tap_w),
                    pl_k)
            center_k = centers.reshape(S, SZ, -1)[:, gidx]
            ck = jnp.where(at_k.has_anchors,
                           0.25 * center_k + 0.75 * at_k.cost, center_k)
            return _scatter_blend(centers, ck), at_k

    # candidates = the first 8 anchors' planes (APD.cu:2768-2779), gathered
    # for the active color's pixels only
    a8_x = jnp.clip(anchors.coords[:8, ..., 0], 0, W - 1)
    a8_y = jnp.clip(anchors.coords[:8, ..., 1], 0, H - 1)
    idx8 = jax.vmap(pk)(a8_y * W + a8_x)                   # [8, H', W']
    cand_planes = state.plane.reshape(-1, 4)[idx8]         # [8, H', W', 4]
    flags = jax.vmap(pk)(anchors.valid[:8])

    xs_c, ys_c, rx_c, ry_c = pk(xs), pk(ys), pk(rx), pk(ry)
    plane_cur = pk(state.plane)
    sel_cur = pk(state.sel_views)
    fit_c = pk(fit_plane)

    # one batched deformable evaluation: 8 candidates + current + fit
    slot_planes = jnp.concatenate(
        [cand_planes, plane_cur[None], fit_c[None]])
    if exact:
        slot10 = jax.lax.map(deform_slot, slot_planes)
    else:
        slot10, at10_k = deform_slots_batched(slot_planes)
    cost_array = slot10[:8]

    # anchor-based view-selection prior (APD.cu:2788-2801)
    sel_a8 = state.sel_views.reshape(-1, V)[idx8]          # [8, H', W', V]
    prior = jnp.sum(jnp.where(flags[..., None],
                              jnp.where(sel_a8, 0.9, 0.1), 0.0), axis=0)

    view_weights, temp_sel, weight_norm = mhjvs(
        k_view, cost_array, flags, prior, it,
        num_samples=static.view_samples)

    if gctx is not None:
        # one batched geom eval for candidates + current + fit
        # (missing anchors cost geom_factor*3, APD.cu:2857-2868)
        g10 = _geom_batch(
            gctx, slot_planes,
            xs_c, ys_c, ref_cam, static.cost_backend, parity=par)
        g8 = jnp.where(flags[..., None], g10[:8], 3.0)
        cost_array = cost_array + dyn.geom_factor * g8
    final_costs = weighted_cost(cost_array, view_weights[None],
                                weight_norm[None])

    cur_vec = slot10[8]
    if gctx is not None:
        cur_vec = cur_vec + dyn.geom_factor * g10[8]
    cost0 = weighted_cost(cur_vec, view_weights, weight_norm)

    min_idx = jnp.argmin(final_costs, axis=0)
    best_cost = take0(final_costs, min_idx)
    best_plane = take0(cand_planes, min_idx)
    best_flag = take0(flags, min_idx)
    depth_before = depth_from_plane(best_plane, xs_c, ys_c, ref_cam)
    adopt = (best_flag & (depth_before >= dyn.depth_min)
             & (depth_before <= dyn.depth_max) & (best_cost < cost0))
    plane_now = jnp.where(adopt[..., None], best_plane, plane_cur)
    cost_now = jnp.where(adopt, best_cost, cost0)
    sel_now = jnp.where(adopt[..., None], temp_sel, sel_cur)

    # fit-plane test (PlaneHypothesisRefinementWeak, APD.cu:1920-1950)
    has_fit = jnp.any(fit_c[..., :3] != 0, axis=-1)
    fit_vec = slot10[9]
    if gctx is not None:
        fit_vec = fit_vec + dyn.geom_factor * g10[9]
    fit_cost = weighted_cost(fit_vec, view_weights, weight_norm)
    fit_depth = depth_from_plane(fit_c, xs_c, ys_c, ref_cam)
    take_fit = (has_fit & (fit_depth >= dyn.depth_min)
                & (fit_depth <= dyn.depth_max) & (fit_cost < cost_now))
    plane_now = jnp.where(take_fit[..., None], fit_c, plane_now)
    cost_now = jnp.where(take_fit, fit_cost, cost_now)

    # 6-plane random refinement with the deformable cost
    cur_depth = depth_from_plane(plane_now, xs_c, ys_c, ref_cam)
    ref_planes = refinement_planes(
        k_refine, plane_now[..., :3], cur_depth, sel_now, rx_c, ry_c,
        xs_c, ys_c, ref_cam, src_cams, dyn.depth_min, dyn.depth_max)
    if exact:
        ref_vec = jax.lax.map(deform, ref_planes)
    else:
        # The refinement proposals reuse the CURRENT plane's anchor term
        # (slot 8 of the batched call) instead of warping anchors by each
        # random perturbation: the 11-sample anchor NCC is high-variance
        # on random planes and re-warping it per proposal rewards noise
        # (measured round 4: slot-exact refinement dropped every weak-
        # battery scene by 10-20 points; the candidate-independent term is
        # the documented protective approximation, kernels/deformable.py).
        ref_centers = ncc_cost_batch(ctx_yzl_c, ref_planes, parity=par,
                                     plane_mask=pmask_s(6))
        center6_k = ref_centers.reshape(6, SZ, -1)[:, gidx]
        at_cur = at10_k.cost[8]
        has_cur = at10_k.has_anchors[8]
        rk = jnp.where(has_cur[None],
                       0.25 * center6_k + 0.75 * at_cur[None], center6_k)
        ref_vec = _scatter_blend(ref_centers, rk)
    if gctx is not None:
        ref_vec = ref_vec + dyn.geom_factor * _geom_batch(
            gctx, ref_planes, xs_c, ys_c, ref_cam, static.cost_backend,
            parity=par)
    ref_costs = weighted_cost(ref_vec, view_weights[None], weight_norm[None])
    ref_depths = jax.vmap(
        lambda pl_: depth_from_plane(pl_, xs_c, ys_c, ref_cam))(ref_planes)
    ref_ok = (ref_depths >= dyn.depth_min) & (ref_depths <= dyn.depth_max)
    ref_costs = jnp.where(ref_ok, ref_costs, jnp.inf)
    rmin = jnp.argmin(ref_costs, axis=0)
    rcost = take0(ref_costs, rmin)
    rplane = take0(ref_planes, rmin)
    take_ref = rcost < cost_now
    plane_now = jnp.where(take_ref[..., None], rplane, plane_now)
    cost_now = jnp.where(take_ref, rcost, cost_now)

    if static.state == RunState.REFINE_INIT:
        improved = cost_now < cost0 - 0.1
        plane_new = jnp.where(improved[..., None], plane_now, plane_cur)
    else:
        plane_new = plane_now

    # re-cost with the strong full-window NCC for comparability
    # (APD.cu:3072-3088); same weak-tile restriction as the slot batches
    if not exact and use_pk and ctx_yzl.backend == "pallas":
        final_vec = ncc_cost_batch(ctx_c, plane_new[None], parity=par,
                                   plane_mask=pmask_s(1))[0]
    else:
        final_vec = ncc_cost(ctx_c, plane_new, parity=par)
    cost_final = weighted_cost(final_vec, view_weights, weight_norm)

    if use_pk:
        upk = lambda p_, o: unpack_parity(p_, color, o)
        plane_new = upk(plane_new, state.plane)
        cost_final = upk(cost_final, state.cost)
        sel_now = upk(sel_now, state.sel_views)
        view_weights = upk(view_weights, state.view_weights)

    mask = (parity == color) & (state.weak == PixelState.WEAK)
    m1 = mask[..., None]
    return state.replace(
        plane=jnp.where(m1, plane_new, state.plane),
        cost=jnp.where(mask, cost_final, state.cost),
        sel_views=jnp.where(m1, sel_now, state.sel_views),
        view_weights=jnp.where(m1, view_weights, state.view_weights),
    )


def run_pass(
    ref_img: jnp.ndarray,             # [H, W] grayscale 0..255
    src_imgs: jnp.ndarray,            # [V, H, W]
    ref_cam: Camera,
    src_cams: Camera,                 # leading [V]
    static: PMStatic,
    dyn: PMDynamic,
    key: jax.Array,
    init_plane_world: Optional[jnp.ndarray] = None,   # [H, W, 4] (n_w, depth)
    init_sel_views: Optional[jnp.ndarray] = None,     # [H, W, V] bool
    init_weak: Optional[jnp.ndarray] = None,          # [H, W] int8
    src_depths: Optional[jnp.ndarray] = None,         # [V, H, W] for geom
    radius_map: Optional[jnp.ndarray] = None,
    edge: Optional[jnp.ndarray] = None,               # [H, W] edge mask
    label: Optional[jnp.ndarray] = None,              # [H, W] int labels
) -> PassOutput:
    """Run one full PatchMatch pass for a reference view."""
    H, W = ref_img.shape
    V = src_imgs.shape[0]
    xs, ys = _grids(H, W)
    rx = (xs - ref_cam.cx) / ref_cam.fx
    ry = (ys - ref_cam.cy) / ref_cam.fy
    ray = _ray(rx, ry)
    parity = (xs.astype(jnp.int32) + ys.astype(jnp.int32)) % 2

    ctx = build_cost_context(
        ref_img, src_imgs, ref_cam, src_cams,
        sigma_spatial=dyn.sigma_spatial, sigma_color=dyn.sigma_color,
        radius_map=radius_map if static.use_radius else None,
        strong_radius=static.strong_radius, backend=static.cost_backend)
    # checkerboard-packed context views for the half-iteration cost batches
    ctx_pks = ((pack_ctx(ctx, 0), pack_ctx(ctx, 1))
               if static.cost_backend == "pallas" else (None, None))
    gctx = None
    if static.geom_consistency and src_depths is not None:
        gctx = build_geom_context(src_depths, ref_cam, src_cams)

    # ---- pixel states + weak-machinery precomputation ----
    if init_weak is None:
        weak = jnp.full((H, W), PixelState.STRONG, jnp.int8)
    else:
        weak = init_weak
    if init_sel_views is None:
        sel_views = jnp.zeros((H, W, V), bool)
    else:
        sel_views = init_sel_views
    radius = radius_map if radius_map is not None else jnp.zeros((H, W), jnp.float32)

    k_init, k_weak, k_loop = jax.random.split(key, 3)

    use_apd = static.use_APD
    ctx_yzl = None
    anchors = None
    complexity = None
    edge_dist = None
    label_dist = None
    ctx_yzl_pks = (None, None)
    # the edge-adaptive strong branch runs whenever an edge map exists —
    # including FIRST_INIT / use_APD=false rounds (main.cpp:480 computes
    # edges every round; use_edge defaults true in main.h)
    if static.use_edge and edge is not None:
        edge = edge.astype(bool)
        edge_dist = edge_ray_distance(edge)
    if use_apd:
        ctx_yzl = build_cost_context(
            ref_img, src_imgs, ref_cam, src_cams,
            sigma_spatial=dyn.sigma_spatial, sigma_color=dyn.sigma_color,
            strong_radius=static.strong_radius, backend=static.cost_backend,
            color_only_weights=True)
        if static.cost_backend == "pallas":
            ctx_yzl_pks = (pack_ctx(ctx_yzl, 0), pack_ctx(ctx_yzl, 1))
        if static.use_edge and edge is not None:
            complexity = edge_complexity(edge, static.strong_radius)
        if static.use_label and label is not None:
            label_dist = label_boundary_distance(label)
        if static.state == RunState.REFINE_INIT and static.use_detail:
            weak = demote_detail(
                weak,
                edge if static.use_edge and edge is not None else None,
                label if static.use_label and label is not None else None)

    # ---- initialization (RandomInitialization, APD.cu:1273-1309) ----
    if static.state == RunState.FIRST_INIT:
        k_d, k_n = jax.random.split(k_init)
        rand_d = random_depth(k_d, (H, W), dyn.depth_min, dyn.depth_max)
        rand_n = visibility_prior_normal(k_n, rand_d, sel_views, rx, ry,
                                         ref_cam, src_cams)
        rand_plane = plane_from_normal_depth(rand_n, rand_d, xs, ys, ref_cam)
        if init_plane_world is None:
            plane = rand_plane
        else:
            prior_d = init_plane_world[..., 3]
            ok = (prior_d >= dyn.depth_min) & (prior_d <= dyn.depth_max)
            prior_plane = plane_from_world(init_plane_world, xs, ys, ref_cam)
            plane = jnp.where(ok[..., None], prior_plane, rand_plane)
        cost, sel_views = _initial_cost_first(ctx, plane, static.top_k)
    else:
        assert init_plane_world is not None and init_sel_views is not None
        plane = plane_from_world(init_plane_world, xs, ys, ref_cam)
        cost, sel_views = _initial_cost_refine(ctx, plane, sel_views)

    # anchor generation (GenNeighbours + NeigbourUpdate)
    patch_off = None
    tap_fields = None
    if use_apd:
        if static.exact_deformable:
            from ..kernels.weak import patch_candidates
            patch_off = patch_candidates(ref_img, sel_views, dyn.sigma_color,
                                         weak_radius=static.weak_radius)
        elif static.anchor_taps > 1:
            # production sparse-patch taps: the same per-view visibility-
            # aware candidates (APD.cu:3744-3794), packed into dense
            # per-anchor-position fields once per pass
            from ..kernels.deformable import pack_tap_fields
            from ..kernels.weak import patch_candidates
            patch_off = patch_candidates(ref_img, sel_views, dyn.sigma_color,
                                         weak_radius=static.weak_radius)
            tap_fields = pack_tap_fields(ref_img, patch_off,
                                         static.anchor_taps - 1)
        anchors = find_anchors(
            weak, plane, ref_cam, k_weak,
            rotate_time=static.rotate_time,
            edge=edge if static.use_edge else None,
            complexity=complexity,
            ransac_threshold=dyn.ransac_threshold,
            depth_range=dyn.depth_max - dyn.depth_min,
            use_limit=static.use_limit,
            label=label if static.use_label else None,
            label_dist=label_dist)
        weak = jnp.where((weak == PixelState.WEAK) & ~anchors.reliable,
                         PixelState.UNKNOWN, weak).astype(jnp.int8)

    # Compaction-budget overflow diagnostic (advisor r4): weak pixels past
    # K_w silently fall back to the center-window cost, so surface the
    # worst-case count.  The in-pass weak set only shrinks (demotions), so
    # the initial count bounds every iteration's compaction.
    weak_overflow = None
    if use_apd and not static.exact_deformable:
        wk0 = weak == PixelState.WEAK
        if static.cost_backend == "pallas":
            ofl = []
            for color in (0, 1):
                wpk = pack_parity(wk0, color)
                ofl.append(jnp.sum(wpk)
                           - _weak_budget(wpk.size, static.weak_budget_frac))
            over = jnp.maximum(ofl[0], ofl[1])
        else:
            over = jnp.sum(wk0) - _weak_budget(
                wk0.size, static.weak_budget_frac)
        weak_overflow = jnp.maximum(over, 0).astype(jnp.int32)

    state = PMState(plane=plane, cost=cost, sel_views=sel_views,
                    view_weights=jnp.zeros((H, W, V), jnp.float32),
                    weak=weak, radius=radius)

    # ---- checkerboard iterations ----
    def iteration(it, st):
        k_it = jax.random.fold_in(k_loop, it)
        for color in (0, 1):
            st = _propagate_color_strong(
                st, color, it, k_it, ctx, ctx_pks[color], ref_cam, src_cams,
                static, dyn, xs, ys, rx, ry, ray, parity,
                edge=edge, edge_dist=edge_dist)
        if use_apd:
            fit_plane, new_radius = ransac_fit_plane(
                anchors, st.plane, st.weak, ref_cam,
                jax.random.fold_in(k_it, 3), use_radius=static.use_radius,
                strong_radius=static.strong_radius,
                edge_dist=edge_dist, label_dist=label_dist)
            if static.use_radius and new_radius is not None:
                st = st.replace(radius=jnp.where(
                    st.weak == PixelState.WEAK, new_radius, st.radius))
            for color in (0, 1):
                st = _propagate_color_weak(
                    st, anchors, fit_plane, color, it, k_it, ctx,
                    ctx_pks[color], ctx_yzl, ctx_yzl_pks[color],
                    gctx, ref_img, ref_cam, src_cams, static, dyn,
                    xs, ys, rx, ry, parity, patch_off=patch_off,
                    tap_fields=tap_fields)
        return st

    state = jax.lax.fori_loop(0, static.max_iterations, iteration, state)

    # ---- post: depth/normal extraction + filters ----
    depth = depth_from_plane(state.plane, xs, ys, ref_cam)
    normal_ref = state.plane[..., :3]

    depth = median_filter_depth(depth, state.weak, state.cost)

    cost_line = None
    if static.debug_dumps:
        weak_new, cost_line = depth_to_weak(
            ctx, gctx, dyn.geom_factor, normal_ref, depth, state.sel_views,
            state.view_weights, xs, ys, ref_cam, src_cams,
            dyn.depth_min, dyn.depth_max, dyn.weak_peak_radius,
            return_curve=True)
    else:
        weak_new = depth_to_weak(
            ctx, gctx, dyn.geom_factor, normal_ref, depth, state.sel_views,
            state.view_weights, xs, ys, ref_cam, src_cams,
            dyn.depth_min, dyn.depth_max, dyn.weak_peak_radius)

    depth = local_refine(
        ctx, gctx, dyn.geom_factor, normal_ref, depth, state.sel_views,
        state.view_weights, xs, ys, ref_cam, src_cams,
        dyn.depth_min, dyn.depth_max)

    # host-extraction semantics (main.cpp:300-308): out-of-range -> 0/UNKNOWN
    in_range = (depth >= dyn.depth_min) & (depth <= dyn.depth_max)
    depth = jnp.where(in_range, depth, 0.0)
    weak_new = jnp.where(in_range, weak_new, PixelState.UNKNOWN).astype(jnp.int8)

    normal_world = jnp.einsum("ji,hwj->hwi", ref_cam.R, normal_ref)
    radius_out = jnp.where(state.radius == 0, float(static.strong_radius),
                           state.radius)

    dbg = {}
    if static.debug_dumps:
        dbg["cost_line"] = cost_line
        if use_apd:
            dbg["anchors_xy"] = anchors.coords
            dbg["anchors_valid"] = anchors.valid
    return PassOutput(depth=depth, normal_world=normal_world, cost=state.cost,
                      weak=weak_new, sel_views=state.sel_views,
                      view_weights=state.view_weights, radius=radius_out,
                      weak_overflow=weak_overflow, **dbg)


def make_pass_fn(static: PMStatic):
    """jit-compiled run_pass with the static config baked in."""
    return jax.jit(partial(run_pass, static=static))
