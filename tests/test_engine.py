"""End-to-end engine tests: the strong-only slice must recover depth on a
synthetic scene from random initialization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvpmvs.config import PMDynamic, PMStatic, PixelState, RunState
from dvpmvs.engine import run_pass
from dvpmvs.geometry import stack_cameras
from dvpmvs.utils.synthetic import make_scene


@pytest.fixture(scope="module")
def scene():
    return make_scene(num_views=5, height=96, width=128, seed=2)


@pytest.fixture(scope="module")
def first_out(scene):
    return _run_first(scene)


# one jitted program per static config, shared by the engine tests AND the
# accuracy battery below (identical shapes/statics -> single compile)
_PASS_FNS = {}


def _pass_fn(static):
    fn = _PASS_FNS.get(static)
    if fn is None:
        from functools import partial
        fn = jax.jit(partial(run_pass, static=static))
        _PASS_FNS[static] = fn
    return fn


def _run_first(scene, view=0, max_iterations=3):
    ref_cam = scene.cameras[view]
    src_ids = [v for v in range(len(scene.cameras)) if v != view]
    src_cams = stack_cameras([scene.cameras[v] for v in src_ids])
    static = PMStatic(state=RunState.FIRST_INIT, num_src=len(src_ids),
                      max_iterations=max_iterations)
    dyn = PMDynamic.create(depth_min=float(scene.cameras[view].depth_min),
                           depth_max=float(scene.cameras[view].depth_max))
    out = _pass_fn(static)(
        jnp.asarray(scene.images[view]),
        jnp.asarray(scene.images[src_ids]),
        ref_cam, src_cams, dyn=dyn, key=jax.random.PRNGKey(0))
    return out


def test_first_init_recovers_depth(scene, first_out):
    out = first_out
    gt = scene.gt_depth[0]
    depth = np.asarray(out.depth)
    m = 8
    valid = depth[m:-m, m:-m] > 0
    rel = np.abs(depth[m:-m, m:-m] - gt[m:-m, m:-m]) / gt[m:-m, m:-m]
    acc = float(np.mean((rel < 0.02) & valid))
    # random init + 3 checkerboard iterations on a textured scene
    assert acc > 0.7, f"2% depth accuracy only {acc:.3f}"

    # normals should roughly agree with GT too (dot > 0.9 on half the px)
    nw = np.asarray(out.normal_world)
    R = np.asarray(scene.cameras[0].R)
    n_cam = nw @ R.T
    dots = np.sum(n_cam[m:-m, m:-m] * scene.gt_normal[0][m:-m, m:-m], axis=-1)
    assert float(np.mean(dots > 0.9)) > 0.5

    # selected views: most pixels should select at least 2 sources
    nsel = np.asarray(jnp.sum(out.sel_views, axis=-1))
    assert float(np.mean(nsel[m:-m, m:-m] >= 2)) > 0.8

    # weak map: textured scene, most interior pixels classify STRONG
    weak = np.asarray(out.weak)
    assert float(np.mean(weak[m:-m, m:-m] == PixelState.STRONG)) > 0.6


def test_pass_is_deterministic(scene, first_out):
    # Re-run with identical statics/shapes: hits the fixture's compiled
    # program (no second multi-minute compile) and must reproduce bitwise —
    # counter-based jax.random, no clock64 seeding (SURVEY §4 determinism).
    out2 = _run_first(scene)
    np.testing.assert_array_equal(np.asarray(first_out.depth),
                                  np.asarray(out2.depth))
    np.testing.assert_array_equal(np.asarray(first_out.weak),
                                  np.asarray(out2.weak))


# ---------------------------------------------------------------------------
# Tracked synthetic accuracy battery (round-2 verdict item 7): four scenes
# stressing occlusion, texturelessness and radiometric noise; identical
# shapes/statics to the fixture above, so the battery reuses its compiled
# program via the persistent cache (this is why it lives in this file).
H_B, W_B, NV = 96, 128, 5


SCENES = {
    "textured": dict(seed=2),
    "occlusion": dict(seed=3, sphere=True),
    "textureless": dict(seed=4, weak_disc=True),
    "noise": dict(seed=5, noise=6.0),
}

# (acc2% floor, completeness floor) per scene — round-3 measured values
# minus a safety margin (see BASELINE.md synthetic accuracy table)
FLOORS = {
    "textured": (0.90, 0.95),     # round-3 measured 0.986 / 1.000
    "occlusion": (0.70, 0.95),    # 0.801 / 1.000
    "textureless": (0.75, 0.95),  # 0.880 / 1.000
    "noise": (0.65, 0.95),        # 0.767 / 1.000
}


@pytest.fixture(scope="module")
def battery():
    rows = {}
    for name, kw in SCENES.items():
        scene = make_scene(num_views=NV, height=H_B, width=W_B, **kw)
        out = _run_first(scene)            # shares the fixture's compile
        d = np.asarray(out.depth)
        gt = scene.gt_depth[0]
        m = 8
        di, gi = d[m:-m, m:-m], gt[m:-m, m:-m]
        valid = di > 0
        rel = np.abs(di - gi) / np.maximum(gi, 1e-6)
        rows[name] = (float(((rel < 0.02) & valid).mean()),
                      float(valid.mean()))
    print("\nsynthetic accuracy battery (FIRST_INIT, %dx%d, V=%d):"
          % (H_B, W_B, NV - 1))
    for name, (acc, comp) in rows.items():
        print(f"  {name:12s} acc2%={acc:.3f} completeness={comp:.3f}")
    return rows


@pytest.mark.parametrize("name", list(SCENES))
def test_scene_floor(battery, name):
    acc, comp = battery[name]
    acc_floor, comp_floor = FLOORS[name]
    assert acc >= acc_floor, (name, acc)
    assert comp >= comp_floor, (name, comp)
