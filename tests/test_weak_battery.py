"""Weak-structure accuracy battery: the FULL schedule (FIRST_INIT ->
REFINE_INIT -> REFINE_ITER with use_APD) on view-consistent textureless
scenes, comparing the production anchor term against the reference-exact
sparse-patch oracle (round-3 verdict item 4 — the production-beats-oracle
claim needs more than one stress band).

Floors are set per scene for BOTH cost models from measured round-4 values
minus a margin; the battery prints the default-vs-exact deltas (recorded in
BASELINE.md).  Matches /root/reference/APD.cu:3744-3794, 835-1021.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvpmvs.config import PMDynamic, PMStatic, PixelState, RunState
from dvpmvs.engine import run_pass
from dvpmvs.geometry import stack_cameras
from dvpmvs.utils.synthetic import make_scene

H, W, NV = 48, 64, 3
V = NV - 1

SCENES = {
    "disc": dict(seed=4, weak_disc=True),
    "band": dict(seed=6, weak_band=True),
    "band+noise": dict(seed=8, weak_band=True, noise=4.0),
}

# (acc2% floor default, acc2% floor exact) over the textureless region
# after the full schedule — measured round 4 minus a margin
FLOORS = {
    "disc": (0.60, 0.55),
    "band": (0.55, 0.50),
    "band+noise": (0.45, 0.40),
}

_PASS_FNS = {}


def _pass_fn(static):
    fn = _PASS_FNS.get(static)
    if fn is None:
        from functools import partial
        fn = jax.jit(partial(run_pass, static=static))
        _PASS_FNS[static] = fn
    return fn


def _full_schedule(scene, exact: bool):
    """FIRST_INIT -> REFINE_INIT(APD) -> REFINE_ITER(APD, geom)."""
    ref_cam = scene.cameras[0]
    src_ids = list(range(1, NV))
    src_cams = stack_cameras([scene.cameras[i] for i in src_ids])
    ri = jnp.asarray(scene.images[0])
    si = jnp.asarray(scene.images[src_ids])
    dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min),
                           depth_max=float(ref_cam.depth_max))
    key = jax.random.PRNGKey(0)
    base = dict(num_src=V, cost_backend="exact", rotate_time=2,
                use_edge=False, use_label=False, exact_deformable=exact)

    st0 = PMStatic(state=RunState.FIRST_INIT, max_iterations=2,
                   **{**base, "exact_deformable": False})
    out = _pass_fn(st0)(ri, si, ref_cam, src_cams, dyn=dyn, key=key)

    def init_kwargs(o):
        return dict(
            init_plane_world=jnp.concatenate(
                [o.normal_world, o.depth[..., None]], -1),
            init_sel_views=o.sel_views, init_weak=o.weak)

    st1 = PMStatic(state=RunState.REFINE_INIT, max_iterations=1,
                   use_APD=True, **base)
    out = _pass_fn(st1)(ri, si, ref_cam, src_cams, dyn=dyn,
                        key=jax.random.fold_in(key, 1), **init_kwargs(out))

    st2 = PMStatic(state=RunState.REFINE_ITER, max_iterations=1,
                   use_APD=True, geom_consistency=True, **base)
    out = _pass_fn(st2)(ri, si, ref_cam, src_cams, dyn=dyn,
                        key=jax.random.fold_in(key, 2),
                        src_depths=jnp.asarray(scene.gt_depth[src_ids]),
                        **init_kwargs(out))
    return out


def _weak_region_acc(scene, out):
    """acc2% over the interior textureless region (image variance ~ 0)."""
    img = scene.images[0]
    from scipy.ndimage import uniform_filter
    local_var = (uniform_filter(img ** 2, 7)
                 - uniform_filter(img, 7) ** 2)
    m = 6
    region = local_var < 1.0
    region[:m] = region[-m:] = region[:, :m] = region[:, -m:] = False
    d = np.asarray(out.depth)
    gt = scene.gt_depth[0]
    rel = np.abs(d - gt) / np.maximum(gt, 1e-6)
    n = max(int(region.sum()), 1)
    return float(((rel < 0.02) & (d > 0) & region).sum() / n), int(region.sum())


@pytest.fixture(scope="module")
def weak_battery():
    rows = {}
    for name, kw in SCENES.items():
        scene = make_scene(num_views=NV, height=H, width=W, **kw)
        acc_d, npix = _weak_region_acc(scene, _full_schedule(scene, False))
        acc_e, _ = _weak_region_acc(scene, _full_schedule(scene, True))
        rows[name] = (acc_d, acc_e, npix)
    print("\nweak-structure battery (full schedule, %dx%d, V=%d; acc2%% on "
          "the textureless region):" % (H, W, V))
    for name, (a_d, a_e, n) in rows.items():
        print(f"  {name:11s} default={a_d:.3f} exact={a_e:.3f} "
              f"delta={a_d - a_e:+.3f} ({n} px)")
    return rows


@pytest.mark.slow
@pytest.mark.parametrize("name", list(SCENES))
def test_weak_scene_floor(weak_battery, name):
    acc_d, acc_e, _ = weak_battery[name]
    floor_d, floor_e = FLOORS[name]
    assert acc_d >= floor_d, (name, "default", acc_d)
    assert acc_e >= floor_e, (name, "exact", acc_e)
