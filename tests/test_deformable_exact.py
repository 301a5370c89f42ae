"""Quantify the warp-field deformable-cost approximation vs the
reference-exact sparse-patch oracle (ComputeBilateralNCCNew,
APD.cu:835-1021) on a structured synthetic: a textureless band whose depth
only the anchor machinery can recover.

The comparison drives ONE weak propagation pair (both checkerboard colors)
directly — the full-pass variant conflates post-filters and strong-pass
effects and costs ~13 min of CPU scan compiles; the isolated step is the
actual surface where the two cost models differ.  The band init is
corrupted by 25% depth; recovery requires the anchor term to discriminate
candidate planes where the center window is ambiguous (the slot-exact
anchor term, kernels/deformable.py::anchor_cost_term_for_plane).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvpmvs.config import PMDynamic, PMStatic, PixelState, RunState
from dvpmvs.engine.patchmatch import (_grids, _initial_cost_refine,
                                      _propagate_color_weak)
from dvpmvs.engine.state import PMState
from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import depth_from_plane, plane_from_world
from dvpmvs.kernels.ncc import build_cost_context
from dvpmvs.kernels.weak import (find_anchors, patch_candidates,
                                 ransac_fit_plane)
from dvpmvs.utils.synthetic import make_scene


@pytest.fixture(scope="module")
def weak_band():
    H, W = 40, 56
    scene = make_scene(num_views=3, height=H, width=W, seed=11)
    imgs = np.asarray(scene.images).copy()
    band = slice(16, 26)
    imgs[:, band, :] = imgs[:, band, :].mean(axis=(1, 2), keepdims=True)
    weak = np.full((H, W), 1, np.int8)
    weak[band, 6:-6] = 0

    ref_cam = scene.cameras[0]
    src_cams = stack_cameras(scene.cameras[1:3])
    gtn = jnp.asarray(scene.gt_normal[0])
    gtd = jnp.asarray(scene.gt_depth[0])
    bad = jnp.asarray(weak == 0)
    d0 = jnp.where(bad, gtd * 1.25, gtd)
    init_pw = jnp.concatenate([gtn, d0[..., None]], -1)

    xs, ys = _grids(H, W)
    plane = plane_from_world(init_pw, xs, ys, ref_cam)
    dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min),
                           depth_max=float(ref_cam.depth_max))
    ri = jnp.asarray(imgs[0])
    si = jnp.asarray(imgs[1:3])
    ctx = build_cost_context(ri, si, ref_cam, src_cams, 5.0, 3.0,
                             backend="exact")
    ctx_yzl = build_cost_context(ri, si, ref_cam, src_cams, 5.0, 3.0,
                                 backend="exact", color_only_weights=True)
    cost, sel = _initial_cost_refine(ctx, plane, jnp.ones((H, W, 2), bool))

    anchors = find_anchors(jnp.asarray(weak), plane, ref_cam,
                           jax.random.PRNGKey(1), rotate_time=2, edge=None,
                           complexity=None,
                           ransac_threshold=dyn.ransac_threshold,
                           depth_range=dyn.depth_max - dyn.depth_min,
                           use_limit=True, label=None, label_dist=None)
    weak2 = jnp.where(jnp.asarray(weak == 0) & ~anchors.reliable,
                      PixelState.UNKNOWN, jnp.asarray(weak)).astype(jnp.int8)
    fit_plane, _ = ransac_fit_plane(anchors, plane, weak2, ref_cam,
                                    jax.random.PRNGKey(3), use_radius=False,
                                    strong_radius=5, edge_dist=None,
                                    label_dist=None)
    return dict(scene=scene, imgs=imgs, weak=np.asarray(weak2),
                ref_cam=ref_cam, src_cams=src_cams, dyn=dyn, ri=ri,
                ctx=ctx, ctx_yzl=ctx_yzl, plane=plane, cost=cost, sel=sel,
                anchors=anchors, fit_plane=fit_plane, gtd=gtd)


def _weak_pair(wb, exact: bool):
    H, W = wb["ri"].shape
    xs, ys = _grids(H, W)
    rc = wb["ref_cam"]
    rx = (xs - rc.cx) / rc.fx
    ry = (ys - rc.cy) / rc.fy
    parity = (xs.astype(jnp.int32) + ys.astype(jnp.int32)) % 2
    static = PMStatic(state=RunState.REFINE_ITER, num_src=2,
                      max_iterations=1, cost_backend="exact", use_APD=True,
                      use_edge=False, extend_rounds=0, use_label=False,
                      use_radius=False, exact_deformable=exact)
    patch_off = (patch_candidates(wb["ri"], wb["sel"], wb["dyn"].sigma_color,
                                  weak_radius=5) if exact else None)
    state = PMState(plane=wb["plane"], cost=wb["cost"], sel_views=wb["sel"],
                    view_weights=jnp.zeros_like(wb["sel"], jnp.float32),
                    weak=jnp.asarray(wb["weak"]),
                    radius=jnp.zeros((H, W), jnp.float32))
    for color in (0, 1):
        state = _propagate_color_weak(
            state, wb["anchors"], wb["fit_plane"], color, 0,
            jax.random.PRNGKey(7), wb["ctx"], None, wb["ctx_yzl"], None,
            None, wb["ri"], rc, wb["src_cams"], static, wb["dyn"],
            xs, ys, rx, ry, parity, patch_off=patch_off)
    depth = depth_from_plane(state.plane, xs, ys, rc)
    gt = np.asarray(wb["gtd"])
    m = wb["weak"] == PixelState.WEAK
    rel = np.abs(np.asarray(depth) - gt) / np.maximum(gt, 1e-6)
    return float((rel[m] < 0.02).mean())


@pytest.mark.slow
def test_warpfield_vs_exact_accuracy(weak_band):
    acc_exact = _weak_pair(weak_band, exact=True)
    acc_warp = _weak_pair(weak_band, exact=False)
    print(f"\nweak-band acc2% after one weak pair — exact sparse-patch: "
          f"{acc_exact:.3f}, warp-field + slot-exact anchors: {acc_warp:.3f},"
          f" delta: {acc_exact - acc_warp:+.3f}")
    # both modes must pull the band (25%-corrupted init) toward GT
    assert acc_exact > 0.5, acc_exact
    assert acc_warp > 0.5, acc_warp
    # the production term must stay within 2 points of the oracle (round-2
    # verdict item 2).  Round-3 state: slot-exact candidate anchors + per-
    # group NCC put the production path AHEAD of the oracle (0.783 vs
    # 0.736); this gate catches regressions back toward the round-2 gap
    # (0.65 vs 0.74).
    assert acc_warp > acc_exact - 0.02, (acc_warp, acc_exact)
