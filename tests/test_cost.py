"""Cost-kernel tests: GT planes must beat perturbed planes; geometric
consistency with GT depths must be near zero."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvpmvs.geometry import Camera, stack_cameras, dist_to_origin
from dvpmvs.kernels import (
    build_cost_context, build_geom_context, geom_consistency_cost,
    ncc_cost, ncc_cost_batch, bilinear_sample,
)
from dvpmvs.utils.synthetic import make_scene


@pytest.fixture(scope="module")
def scene():
    return make_scene(num_views=4, height=72, width=96, seed=11)


def _gt_plane(scene, view=0):
    """Build the (n_ref, w) plane field from GT depth + camera-frame normal."""
    ref = scene.cameras[view]
    H, W = scene.images[view].shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    n = jnp.asarray(scene.gt_normal[view])
    depth = jnp.asarray(scene.gt_depth[view])
    w = dist_to_origin(n, xs, ys, depth, ref)
    return jnp.concatenate([n, w[..., None]], axis=-1)


def _ctx(scene, view=0, backend="exact"):
    ref = scene.cameras[view]
    src_ids = [v for v in range(len(scene.cameras)) if v != view]
    src_cams = stack_cameras([scene.cameras[v] for v in src_ids])
    src_imgs = jnp.asarray(scene.images[src_ids])
    return build_cost_context(jnp.asarray(scene.images[view]), src_imgs,
                              ref, src_cams, sigma_spatial=5.0,
                              sigma_color=3.0, backend=backend), src_ids


def test_bilinear_sample_exact_at_integers():
    img = jnp.arange(12.0).reshape(3, 4)
    x = jnp.array([0.0, 1.0, 3.0, 1.5])
    y = jnp.array([0.0, 2.0, 1.0, 0.5])
    out = bilinear_sample(img, x, y)
    np.testing.assert_allclose(out, [0.0, 9.0, 7.0, 3.5], atol=1e-6)


def test_gt_plane_has_low_cost(scene):
    ctx, _ = _ctx(scene)
    plane = _gt_plane(scene)
    cost = ncc_cost(ctx, plane)     # [H, W, V]
    H, W, V = cost.shape
    interior = cost[8:-8, 8:-8]
    med = float(jnp.median(interior))
    assert med < 0.15, med

    # perturbed depths must be clearly worse (relative discrimination)
    bad = plane.at[..., 3].mul(1.10)
    med_bad = float(jnp.median(ncc_cost(ctx, bad)[8:-8, 8:-8]))
    assert med_bad > 5.0 * med, (med, med_bad)
    worse = plane.at[..., 3].mul(1.30)
    med_worse = float(jnp.median(ncc_cost(ctx, worse)[8:-8, 8:-8]))
    assert med_worse > med_bad, (med_bad, med_worse)


def test_cost_batch_matches_single(scene):
    ctx, _ = _ctx(scene)
    plane = _gt_plane(scene)
    bad = plane.at[..., 3].mul(1.05)
    batch = jnp.stack([plane, bad])
    costs = ncc_cost_batch(ctx, batch)
    np.testing.assert_allclose(costs[0], ncc_cost(ctx, plane), atol=1e-3)
    np.testing.assert_allclose(costs[1], ncc_cost(ctx, bad), atol=1e-3)


def test_out_of_view_is_cost_max(scene):
    ctx, _ = _ctx(scene)
    plane = _gt_plane(scene)
    # absurd depth drives the warp far out of every source view for most px
    plane_far = plane.at[..., 3].set(1e-4)
    cost = ncc_cost(ctx, plane_far)
    frac_max = float(jnp.mean(cost >= 1.99))
    assert frac_max > 0.5


def test_warp_mode_matches_exact_on_smooth_fields(scene):
    """Warp-once cost == exact cost when the plane field is locally smooth
    (taps then see the same homography either way, up to interpolation)."""
    ctx_e, _ = _ctx(scene, backend="exact")
    ctx_w, _ = _ctx(scene, backend="warp")
    plane = _gt_plane(scene)
    ce = ncc_cost(ctx_e, plane)
    cw = ncc_cost(ctx_w, plane)
    m = 10
    # medians agree and per-pixel costs correlate strongly in the interior
    diff = jnp.abs(ce - cw)[m:-m, m:-m]
    assert float(jnp.median(diff)) < 0.05
    # discrimination is preserved
    bad = plane.at[..., 3].mul(1.10)
    med_good = float(jnp.median(cw[m:-m, m:-m]))
    med_bad = float(jnp.median(ncc_cost(ctx_w, bad)[m:-m, m:-m]))
    assert med_bad > 5.0 * max(med_good, 0.005)


def test_geom_consistency_gt_near_zero(scene):
    view = 0
    src_ids = [v for v in range(len(scene.cameras)) if v != view]
    ref = scene.cameras[view]
    src_cams = stack_cameras([scene.cameras[v] for v in src_ids])
    src_depths = jnp.asarray(scene.gt_depth[src_ids])
    gctx = build_geom_context(src_depths, ref, src_cams)
    cost = geom_consistency_cost(gctx, jnp.asarray(scene.gt_depth[view]))
    med = float(jnp.median(cost[8:-8, 8:-8]))
    assert med < 0.5, med

    # wrong depths blow up the reprojection error
    cost_bad = geom_consistency_cost(gctx, jnp.asarray(scene.gt_depth[view]) * 1.2)
    med_bad = float(jnp.median(cost_bad[8:-8, 8:-8]))
    assert med_bad > 1.0, med_bad
    assert med_bad > 3.0 * max(med, 0.1), (med, med_bad)
