"""Disparity-sweep kernels: weak/strong reclassification and local refine.

Oracles:
  * ``DepthToWeak`` (APD.cu:3892-4051): per pixel, sweep ±30 disparity steps
    of the view-weighted NCC(+geom) cost around the current depth (disparity
    parametrized by the mean selected-view baseline), find local minima and
    classify WEAK / STRONG / UNKNOWN from the peak structure.
  * ``LocalRefine`` (APD.cu:4053-4139): ±5 disparity polish; adopt the best
    depth if it improves the cost by > 0.1.

Both keep the pixel's current normal and only re-encode the plane offset per
candidate depth; costs batch through chunked fused NCC evaluations over the sweep axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import PixelState
from ..geometry.camera import Camera
from .geom import GeomContext, geom_consistency_cost
from .ncc import COST_MAX, CostContext, ncc_cost_batch
from .propagation import tile_view_mask
from .sampling import plane_from_normal_depth


def _field_sweep_eligible(ctx: CostContext) -> bool:
    """The fused sweep kernel serves pallas contexts with a static window."""
    return (ctx.backend == "pallas" and ctx.packed_quads is not None
            and not ctx.has_radius_map)


def _field_sweep_costs(ctx: CostContext, gctx: GeomContext | None,
                       geom_factor, depth, baseline, k0: int, K: int,
                       sel_views, view_weights, ref_cam: Camera,
                       depth_min, depth_max, chunk: int = 8):
    """[K, H, W] sweep costs via the fused warp-field Pallas kernel.

    Steps are k - k0 around the per-pixel disparity of ``depth``; weighting,
    in-range and no-view masking match ``_sweep_costs`` exactly.  The geom
    term (REFINE_ITER) folds through the geom Pallas kernel.
    """
    from .geom_pallas import geom_cost_pallas
    from .sweep_pallas import sweep_weighted_from_ctx

    fx = ref_cam.fx
    w = view_weights * sel_views.astype(jnp.float32)
    norm = jnp.sum(w, axis=-1)
    wsum = sweep_weighted_from_ctx(ctx, depth, baseline, fx, w, K=K, k0=k0)

    disp = fx * baseline / jnp.maximum(depth, 1e-12)
    ks = jnp.arange(K, dtype=jnp.float32) - k0
    depth_stack = fx * baseline / (disp[None] + ks[:, None, None])
    if gctx is not None:
        gw = geom_cost_pallas(gctx, depth_stack, vweights=w, fold=True)
        wsum = wsum + geom_factor * gw
    cost = wsum / jnp.maximum(norm, 1e-30)[None]
    in_range = (depth_stack >= depth_min) & (depth_stack <= depth_max)
    return jnp.where(in_range & (norm > 0)[None], cost, COST_MAX)


def _mean_selected_baseline(sel_views: jnp.ndarray, ref_cam: Camera,
                            src_cams: Camera) -> jnp.ndarray:
    """Per-pixel mean ||C_ref - C_src|| over selected views -> [H, W]."""
    bl = jnp.linalg.norm(ref_cam.c[None, :] - src_cams.c, axis=-1)  # [V]
    sel = sel_views.astype(jnp.float32)
    cnt = jnp.sum(sel, axis=-1)
    tot = jnp.sum(sel * bl[None, None, :], axis=-1)
    return jnp.where(cnt > 0, tot / jnp.maximum(cnt, 1.0), 0.0), cnt


def _weighted_sweep_cost(ctx: CostContext, gctx: GeomContext | None,
                         geom_factor, normal, depth_cand, sel_views,
                         view_weights, xs, ys, ref_cam,
                         depth_min, depth_max, view_mask=None):
    """Cost of one candidate depth field under the pixel's normal -> [H, W]."""
    return _sweep_costs(ctx, gctx, geom_factor, normal, depth_cand[None],
                        sel_views, view_weights, xs, ys, ref_cam,
                        depth_min, depth_max, view_mask=view_mask)[0]


def _sweep_costs(ctx: CostContext, gctx: GeomContext | None,
                 geom_factor, normal, depth_stack, sel_views,
                 view_weights, xs, ys, ref_cam,
                 depth_min, depth_max, chunk: int = 8, view_mask=None):
    """Costs of K candidate depth fields [K, H, W] -> [K, H, W].

    Candidates are evaluated in batched chunks so the fused Pallas backend
    amortizes weights/warp setup; chunking bounds the [k, H, W, V] cost
    intermediate.  ``view_mask`` skips views whose MHJVS weight is zero
    everywhere in a tile (exact: the reference's sweep only touches selected
    weighted views, APD.cu:3979-3987)."""
    K = depth_stack.shape[0]
    w = view_weights * sel_views.astype(jnp.float32)
    norm = jnp.sum(w, axis=-1)
    outs = []
    for k0 in range(0, K, chunk):
        d = depth_stack[k0:k0 + chunk]
        planes = jax.vmap(
            lambda dd: plane_from_normal_depth(normal, dd, xs, ys, ref_cam)
        )(d)
        cv = ncc_cost_batch(ctx, planes, view_mask=view_mask)  # [k,H,W,V]
        if gctx is not None:
            cv = cv + geom_factor * jax.vmap(
                lambda dd: geom_consistency_cost(gctx, dd))(d)
        cost = jnp.sum(cv * w[None], axis=-1) / jnp.maximum(norm, 1e-30)
        in_range = (d >= depth_min) & (d <= depth_max)
        outs.append(jnp.where(in_range & (norm > 0), cost, COST_MAX))
    return jnp.concatenate(outs, axis=0)


def depth_to_weak(
    ctx: CostContext,
    gctx: GeomContext | None,
    geom_factor,
    normal: jnp.ndarray,        # [H, W, 3] ref-frame normal
    depth: jnp.ndarray,         # [H, W]
    sel_views: jnp.ndarray,     # [H, W, V] bool
    view_weights: jnp.ndarray,  # [H, W, V]
    xs, ys,
    ref_cam: Camera, src_cams: Camera,
    depth_min, depth_max, weak_peak_radius,
    radius_steps: int = 30,
    return_curve: bool = False,
) -> jnp.ndarray:
    """Reclassify pixels -> int8 [H, W] of PixelState.

    ``return_curve`` additionally returns the [2*radius_steps+1, H, W]
    sweep cost curves (the reference's DEBUG_COST_LINE buffer,
    APD.cu:3990-3997)."""
    baseline, nsel = _mean_selected_baseline(sel_views, ref_cam, src_cams)
    fx = ref_cam.fx

    if _field_sweep_eligible(ctx):
        p_costs = _field_sweep_costs(
            ctx, gctx, geom_factor, depth, baseline, radius_steps,
            2 * radius_steps + 1, sel_views, view_weights, ref_cam,
            depth_min, depth_max)                             # [61, H, W]
    else:
        disp = fx * baseline / jnp.maximum(depth, 1e-12)
        ks = jnp.arange(-radius_steps, radius_steps + 1, dtype=jnp.float32)
        depth_stack = fx * baseline / (disp[None] + ks[:, None, None])
        vmask = (tile_view_mask(view_weights * sel_views.astype(jnp.float32))
                 if ctx.backend == "pallas" else None)
        p_costs = _sweep_costs(
            ctx, gctx, geom_factor, normal, depth_stack, sel_views,
            view_weights, xs, ys, ref_cam, depth_min, depth_max,
            view_mask=vmask)
    p_costs = jnp.minimum(COST_MAX, p_costs)

    weak = classify_from_sweep(p_costs, depth, nsel, radius_steps,
                               weak_peak_radius)
    return (weak, p_costs) if return_curve else weak


def classify_from_sweep(p_costs: jnp.ndarray, depth: jnp.ndarray,
                        nsel: jnp.ndarray, radius_steps: int,
                        weak_peak_radius) -> jnp.ndarray:
    """Peak-structure classification of sweep cost curves [K, H, W]."""
    H, W = depth.shape
    min_margin = 6
    # local minima ("peaks") over i in [2, 58] (APD.cu:4007-4016)
    interior = jnp.zeros_like(p_costs, dtype=bool)
    is_min = (p_costs[1:-1] < p_costs[:-2]) & (p_costs[1:-1] < p_costs[2:])
    interior = interior.at[1:-1].set(is_min)
    idx = jnp.arange(p_costs.shape[0])[:, None, None]
    interior = interior & (idx >= 2) & (idx <= 2 * radius_steps - 2)

    peak_count = jnp.sum(interior, axis=0)
    masked = jnp.where(interior, p_costs, jnp.inf)
    min_cost = jnp.min(masked, axis=0)
    min_peak = jnp.argmin(masked, axis=0)
    has_peak = peak_count > 0
    min_cost = jnp.where(has_peak, min_cost, COST_MAX)
    min_peak = jnp.where(has_peak, min_peak, 0)

    # classification cascade (APD.cu:4020-4050)
    off_center = (jnp.abs(min_peak - radius_steps) > weak_peak_radius) \
        | (min_cost > 0.5)
    single = peak_count == 1
    single_strong = min_cost <= 0.15

    others = interior & (idx != min_peak[None])
    var = jnp.sqrt(jnp.sum(
        jnp.where(others, (p_costs - min_cost) ** 2, 0.0), axis=0))
    var = var / jnp.maximum(peak_count - 1, 1)
    multi_strong = var > 0.2

    cls = jnp.where(
        off_center, PixelState.WEAK,
        jnp.where(single,
                  jnp.where(single_strong, PixelState.STRONG, PixelState.WEAK),
                  jnp.where(multi_strong, PixelState.STRONG, PixelState.WEAK)))

    ysg, xsg = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    border = ((xsg < min_margin) | (ysg < min_margin)
              | (xsg >= W - min_margin) | (ysg >= H - min_margin))
    unknown = border | (depth == 0) | (nsel == 0)
    return jnp.where(unknown, PixelState.UNKNOWN, cls).astype(jnp.int8)


def local_refine(
    ctx: CostContext,
    gctx: GeomContext | None,
    geom_factor,
    normal: jnp.ndarray,
    depth: jnp.ndarray,
    sel_views: jnp.ndarray,
    view_weights: jnp.ndarray,
    xs, ys,
    ref_cam: Camera, src_cams: Camera,
    depth_min, depth_max,
    radius_steps: int = 5,
) -> jnp.ndarray:
    """±5-disparity polish of the depth map -> refined depth [H, W]."""
    baseline, nsel = _mean_selected_baseline(sel_views, ref_cam, src_cams)
    fx = ref_cam.fx
    disp = fx * baseline / jnp.maximum(depth, 1e-12)

    ks = jnp.arange(-radius_steps, radius_steps + 1, dtype=jnp.float32)
    depths = fx * baseline / (disp[None] + ks[:, None, None])
    if _field_sweep_eligible(ctx):
        costs = _field_sweep_costs(
            ctx, gctx, geom_factor, depth, baseline, radius_steps,
            2 * radius_steps + 1, sel_views, view_weights, ref_cam,
            depth_min, depth_max)                            # [11, H, W]
        cost_now = costs[radius_steps]
    else:
        vmask = (tile_view_mask(view_weights * sel_views.astype(jnp.float32))
                 if ctx.backend == "pallas" else None)
        costs = _sweep_costs(ctx, gctx, geom_factor, normal, depths,
                             sel_views, view_weights, xs, ys, ref_cam,
                             depth_min, depth_max, view_mask=vmask)
        cost_now = _weighted_sweep_cost(ctx, gctx, geom_factor, normal,
                                        depth, sel_views, view_weights, xs,
                                        ys, ref_cam, depth_min, depth_max,
                                        view_mask=vmask)
    best = jnp.argmin(costs, axis=0)
    from .gatherfree import take0
    min_cost = take0(costs, best)
    best_depth = take0(depths, best)
    improve = (cost_now - min_cost > 0.1) & (nsel > 0) & (depth != 0)
    return jnp.where(improve, best_depth, depth)
