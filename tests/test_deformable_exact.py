"""Quantify the warp-field deformable-cost approximation vs the
reference-exact sparse-patch oracle (ComputeBilateralNCCNew,
APD.cu:835-1021) on a structured synthetic: textureless bands whose depth
only the anchor machinery can recover.

Recorded result (see test output / BASELINE.md): the two modes' weak-region
accuracy is compared on identical inputs; the test asserts the approximation
stays within tolerance of the oracle so a regression of the approximation
shows up here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvpmvs.config import PMDynamic, PMStatic, RunState
from dvpmvs.engine import run_pass
from dvpmvs.geometry import stack_cameras
from dvpmvs.utils.synthetic import make_scene


@pytest.fixture(scope="module")
def weak_scene():
    H, W = 40, 56
    scene = make_scene(num_views=3, height=H, width=W, seed=11)
    imgs = np.asarray(scene.images).copy()
    # textureless horizontal band in every view: photometric matching is
    # ambiguous there; depth must come from the anchor machinery
    band = slice(16, 26)
    imgs[:, band, :] = imgs[:, band, :].mean(axis=(1, 2), keepdims=True)
    weak = np.full((H, W), 1, np.int8)
    weak[band, 6:-6] = 0
    return scene, imgs, weak, band


def _run(scene, imgs, weak, exact: bool):
    H, W = imgs.shape[1:]
    ref_cam = scene.cameras[0]
    src_cams = stack_cameras(scene.cameras[1:3])
    dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min),
                           depth_max=float(ref_cam.depth_max))
    st = PMStatic(state=RunState.REFINE_INIT, num_src=2, max_iterations=1,
                  cost_backend="exact", use_APD=True, use_edge=False,
                  extend_rounds=0,
                  use_label=False, use_radius=False,
                  exact_deformable=exact)
    gtn = jnp.asarray(scene.gt_normal[0])
    gtd = jnp.asarray(scene.gt_depth[0])
    # init: ground truth on STRONG pixels, corrupted inside the weak band
    # (1.25x depth) — the weak machinery must pull the band back
    bad = jnp.asarray(weak == 0)
    d0 = jnp.where(bad, gtd * 1.25, gtd)
    init_pw = jnp.concatenate([gtn, d0[..., None]], -1)
    out = run_pass(jnp.asarray(imgs[0]), jnp.asarray(imgs[1:3]), ref_cam,
                   src_cams, st, dyn, jax.random.PRNGKey(0),
                   init_plane_world=init_pw,
                   init_sel_views=jnp.ones((H, W, 2), bool),
                   init_weak=jnp.asarray(weak))
    return np.asarray(out.depth)


def _weak_acc(depth, scene, weak):
    gt = scene.gt_depth[0]
    m = weak == 0
    rel = np.abs(depth - gt) / np.maximum(gt, 1e-6)
    return float((rel[m] < 0.02).mean())


def test_warpfield_vs_exact_accuracy(weak_scene):
    scene, imgs, weak, band = weak_scene
    acc_exact = _weak_acc(_run(scene, imgs, weak, exact=True), scene, weak)
    acc_warp = _weak_acc(_run(scene, imgs, weak, exact=False), scene, weak)
    print(f"\nweak-band acc2% — exact sparse-patch: {acc_exact:.3f}, "
          f"warp-field approximation: {acc_warp:.3f}, "
          f"delta: {acc_exact - acc_warp:+.3f}")
    # both must actually solve the band (the corrupted init is 25% off)
    assert acc_exact > 0.5, acc_exact
    assert acc_warp > 0.5, acc_warp
    # the approximation must stay within 15 points of the oracle
    assert acc_warp > acc_exact - 0.15, (acc_warp, acc_exact)
