"""Fused sweep kernel vs the XLA paths (interpret mode on CPU).

The kernel uses warp-field semantics (kernels/sweep_pallas.py docstring), so
values are compared against the warp-mode XLA cost and the DepthToWeak
classification is compared against the exact path for agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvpmvs.geometry import stack_cameras
from dvpmvs.kernels.ncc import build_cost_context, _ncc_cost_warp
from dvpmvs.kernels.sampling import plane_from_normal_depth
from dvpmvs.kernels.sweep import (_mean_selected_baseline, _sweep_costs,
                                  classify_from_sweep)
from dvpmvs.kernels.sweep_pallas import sweep_weighted_from_ctx
from dvpmvs.utils.synthetic import make_scene

H, W, V = 48, 160, 2
K, K0 = 9, 4


@pytest.fixture(scope="module")
def setup():
    scene = make_scene(num_views=V + 1, height=H, width=W, seed=4)
    ref = scene.cameras[0]
    src_cams = stack_cameras(scene.cameras[1:])
    src_imgs = jnp.asarray(scene.images[1:])
    ref_img = jnp.asarray(scene.images[0])
    ctxs = {b: build_cost_context(ref_img, src_imgs, ref, src_cams, 5.0, 3.0,
                                  backend=b)
            for b in ("warp", "pallas", "exact")}
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    normal = jnp.asarray(scene.gt_normal[0])
    depth = jnp.asarray(scene.gt_depth[0])
    bl = float(np.linalg.norm(np.asarray(ref.c) - np.asarray(src_cams.c[0])))
    return ctxs, ref, src_cams, xs, ys, normal, depth, bl


def test_sweep_kernel_matches_warp_xla(setup):
    ctxs, ref, src_cams, xs, ys, normal, depth, bl = setup
    rng = np.random.default_rng(0)
    vw = jnp.asarray(rng.uniform(0.0, 1.0, (H, W, V)).astype(np.float32))
    baseline = jnp.full((H, W), bl, jnp.float32)
    fx = float(ref.fx)

    got = np.asarray(sweep_weighted_from_ctx(
        ctxs["pallas"], depth, baseline, fx, vw, K=K, k0=K0, interpret=True))

    disp = fx * baseline / jnp.maximum(depth, 1e-12)
    want = []
    for k in range(K):
        dk = fx * baseline / (disp + (k - K0))
        plane_k = plane_from_normal_depth(normal, dk, xs, ys, ref)
        cv = _ncc_cost_warp(ctxs["warp"], plane_k)
        want.append(np.asarray(jnp.sum(cv * vw, axis=-1)))
    want = np.stack(want)

    # borders differ by design (shift2 wraps, the kernel edge-replicates);
    # depth-discontinuity pixels via the DSPAN band clamp
    m = np.zeros((H, W), bool)
    m[6:-6, 6:-6] = True
    diff = np.abs(got - want)[:, m]
    assert np.median(diff) < 0.02
    assert (diff > 0.5).mean() < 0.06


def test_classification_agreement(setup):
    ctxs, ref, src_cams, xs, ys, normal, depth, bl = setup
    sel = jnp.ones((H, W, V), bool)
    vw = jnp.ones((H, W, V), jnp.float32)
    baseline, nsel = _mean_selected_baseline(sel, ref, src_cams)
    fx = float(ref.fx)
    rsteps = K0

    disp = fx * baseline / jnp.maximum(depth, 1e-12)
    ks = jnp.arange(-rsteps, rsteps + 1, dtype=jnp.float32)
    depth_stack = fx * baseline / (disp[None] + ks[:, None, None])
    p_exact = _sweep_costs(ctxs["exact"], None, 0.2, normal, depth_stack,
                           sel, vw, xs, ys, ref, 0.1, 100.0)
    p_field = sweep_weighted_from_ctx(
        ctxs["pallas"], depth, baseline, fx, vw, K=2 * rsteps + 1, k0=rsteps,
        interpret=True) / jnp.maximum(jnp.sum(vw, axis=-1), 1e-30)
    in_range = (depth_stack >= 0.1) & (depth_stack <= 100.0)
    p_field = jnp.where(in_range, p_field, 2.0)

    cls_e = np.asarray(classify_from_sweep(
        jnp.minimum(2.0, p_exact), depth, nsel, rsteps, 2.0))
    cls_f = np.asarray(classify_from_sweep(
        jnp.minimum(2.0, p_field), depth, nsel, rsteps, 2.0))
    agree = (cls_e == cls_f)[6:-6, 6:-6].mean()
    assert agree > 0.85, agree
