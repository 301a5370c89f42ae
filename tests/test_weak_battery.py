"""Weak-structure accuracy battery: FIRST_INIT -> REFINE_INIT -> REFINE_ITER
(use_APD + geom) on view-consistent textureless scenes, comparing the
production anchor term against the reference-exact sparse-patch oracle
(round-3 verdict item 4 — the production-beats-oracle claim needs more than
one stress band).  Matches /root/reference/APD.cu:3744-3794, 835-1021.

Design notes (round 4):
  * The textureless REGION is derived from a noise-free twin of the scene
    (same seed; only the radiometric-noise draws differ), so the noisy
    variant measures the same pixels — the first version's variance test on
    the noisy image yielded an EMPTY region and a vacuous 0.000 floor.
  * After FIRST_INIT the region is injected as the WEAK classification.
    At battery scale the reference-style DepthToWeak reclassification only
    marks a fraction of the region weak (measured: 48 of 127 disc px), so
    without the injection neither cost model's weak machinery engages and
    default == exact to the last digit.  DepthToWeak's own classification
    is covered separately (test_weak_engine.py::test_disc_classified_weak);
    this battery isolates what the verdict item asks about: weak-region
    RECOVERY through the full refinement schedule under both anchor models.
  * Floors are measured round-4 values minus ~0.08-0.12 margin; the
    measured table lives in BASELINE.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvpmvs.config import PMDynamic, PMStatic, PixelState, RunState
from dvpmvs.engine import run_pass
from dvpmvs.geometry import stack_cameras
from dvpmvs.utils.synthetic import make_scene

H, W, NV = 64, 96, 4
V = NV - 1

SCENES = {
    "disc": dict(seed=4, weak_disc=True),
    "band": dict(seed=6, weak_band=True),
    "band+noise": dict(seed=6, weak_band=True, noise=4.0),
}

# acc2% floors over the textureless region after the full schedule:
# (default floor, exact floor) — measured round 4 minus a margin
FLOORS = {
    "disc": (0.55, 0.45),
    "band": (0.60, 0.50),
    "band+noise": (0.50, 0.40),
}

_PASS_FNS = {}


def _pass_fn(static):
    fn = _PASS_FNS.get(static)
    if fn is None:
        from functools import partial
        fn = jax.jit(partial(run_pass, static=static))
        _PASS_FNS[static] = fn
    return fn


def _region_mask(kw):
    """Interior textureless region of view 0, from the noise-free twin."""
    from scipy.ndimage import uniform_filter
    clean = make_scene(num_views=NV, height=H, width=W,
                       **{k: v for k, v in kw.items() if k != "noise"})
    img = clean.images[0]
    local_var = uniform_filter(img ** 2, 7) - uniform_filter(img, 7) ** 2
    region = local_var < 1.0
    m = 6
    region[:m] = region[-m:] = region[:, :m] = region[:, -m:] = False
    return region


def _full_schedule(scene, region, exact: bool):
    """FIRST_INIT -> inject region as WEAK -> REFINE_INIT -> REFINE_ITER."""
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

    weak = jnp.where(jnp.asarray(region), PixelState.WEAK,
                     jnp.asarray(out.weak))
    weak = jnp.where((weak == PixelState.WEAK) & ~jnp.asarray(region),
                     PixelState.STRONG, weak).astype(jnp.int8)

    def init_kwargs(o, wk):
        return dict(
            init_plane_world=jnp.concatenate(
                [o.normal_world, o.depth[..., None]], -1),
            init_sel_views=o.sel_views, init_weak=wk)

    st1 = PMStatic(state=RunState.REFINE_INIT, max_iterations=2,
                   use_APD=True, **base)
    out = _pass_fn(st1)(ri, si, ref_cam, src_cams, dyn=dyn,
                        key=jax.random.fold_in(key, 1),
                        **init_kwargs(out, weak))

    st2 = PMStatic(state=RunState.REFINE_ITER, max_iterations=2,
                   use_APD=True, geom_consistency=True, **base)
    out = _pass_fn(st2)(ri, si, ref_cam, src_cams, dyn=dyn,
                        key=jax.random.fold_in(key, 2),
                        src_depths=jnp.asarray(scene.gt_depth[src_ids]),
                        **init_kwargs(out, weak))
    return out


def _region_acc(scene, region, out):
    d = np.asarray(out.depth)
    gt = scene.gt_depth[0]
    rel = np.abs(d - gt) / np.maximum(gt, 1e-6)
    n = max(int(region.sum()), 1)
    return float(((rel < 0.02) & (d > 0) & region).sum() / n)


@pytest.fixture(scope="module")
def weak_battery():
    rows = {}
    for name, kw in SCENES.items():
        region = _region_mask(kw)
        assert region.sum() > 50, (name, int(region.sum()))
        scene = make_scene(num_views=NV, height=H, width=W, **kw)
        acc_d = _region_acc(scene, region,
                            _full_schedule(scene, region, False))
        acc_e = _region_acc(scene, region,
                            _full_schedule(scene, region, True))
        rows[name] = (acc_d, acc_e, int(region.sum()))
    lines = ["weak-structure battery (full schedule, %dx%d, V=%d; acc2%% "
             "on the textureless region):" % (H, W, V)]
    for name, (a_d, a_e, n) in rows.items():
        lines.append(f"  {name:11s} default={a_d:.3f} exact={a_e:.3f} "
                     f"delta={a_d - a_e:+.3f} ({n} px)")
    table = "\n".join(lines)
    print("\n" + table)
    try:  # sidecar dump: the fixture print is easy to lose in CI filters
        import pathlib
        pathlib.Path("/tmp/weak_battery_table.txt").write_text(table + "\n")
    except OSError:
        pass
    return rows


@pytest.mark.slow
@pytest.mark.parametrize("name", list(SCENES))
def test_weak_scene_floor(weak_battery, name):
    acc_d, acc_e, _ = weak_battery[name]
    floor_d, floor_e = FLOORS[name]
    assert acc_d >= floor_d, (name, "default", acc_d)
    assert acc_e >= floor_e, (name, "exact", acc_e)
