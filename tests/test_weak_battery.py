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
  * The three 64x96 scenes inject the region as the WEAK classification
    after FIRST_INIT — at that scale DepthToWeak marks only a fraction of
    the region weak (48/127 disc px) and the weak machinery would barely
    engage; the injection isolates weak-region RECOVERY under both anchor
    models.  The ``band-nat`` scene (96x128) runs the production loop
    END-TO-END with no injection: DepthToWeak's own classification
    engages naturally there (73% of the region marked weak, 31 false-weak
    px outside — scripts/tune_weak_scene.py), covering
    DepthToWeak -> anchors -> recovery as one pipeline (VERDICT r4
    weak-5).
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

NV = 4
V = NV - 1

# name -> (H, W, scene kwargs, inject).  ``inject=False`` runs the
# production loop end-to-end: FIRST_INIT's own DepthToWeak classification
# (no injected weak mask) feeds REFINE_INIT/REFINE_ITER — VERDICT r4
# weak-5.  At 96x128 the band scene engages naturally: DepthToWeak marks
# 73% of the textureless region WEAK with only 31 false-weak px outside
# (scripts/tune_weak_scene.py, round 5); at the old 64x96 it marked only
# 48/127 px, which is why the smaller scenes keep the injection.
SCENES = {
    "disc": dict(dims=(64, 96), kw=dict(seed=4, weak_disc=True),
                 inject=True, modes=("default", "taps", "exact")),
    "band": dict(dims=(64, 96), kw=dict(seed=6, weak_band=True),
                 inject=True, modes=("default", "taps", "exact")),
    "band+noise": dict(dims=(64, 96),
                       kw=dict(seed=6, weak_band=True, noise=4.0),
                       inject=True, modes=("default", "taps", "exact")),
    # production-loop end-to-end scene: default mode only — the exact and
    # taps XLA-oracle programs at 96x128 cost multi-minute CPU compiles
    # (measured 440 s for one taps REFINE program); the mode comparison
    # lives on the injected 64x96 scenes
    "band-nat": dict(dims=(96, 128), kw=dict(seed=6, weak_band=True),
                     inject=False, modes=("default",)),
}

# acc2% floors over the textureless region after the full schedule:
# (default floor, exact floor) — measured values minus a margin
# (disc/band/band+noise: round 4; band-nat: round 5, BASELINE.md table)
FLOORS = {
    "disc": (0.55, 0.45),
    "band": (0.60, 0.50),
    "band+noise": (0.50, 0.40),
    "band-nat": (0.45, 0.35),
}

_PASS_FNS = {}


def _pass_fn(static):
    fn = _PASS_FNS.get(static)
    if fn is None:
        from functools import partial
        fn = jax.jit(partial(run_pass, static=static))
        _PASS_FNS[static] = fn
    return fn


def _region_mask(dims, kw):
    """Interior textureless region of view 0, from the noise-free twin."""
    from scipy.ndimage import uniform_filter
    H, W = dims
    clean = make_scene(num_views=NV, height=H, width=W,
                       **{k: v for k, v in kw.items() if k != "noise"})
    img = clean.images[0]
    local_var = uniform_filter(img ** 2, 7) - uniform_filter(img, 7) ** 2
    region = local_var < 1.0
    m = 6
    region[:m] = region[-m:] = region[:, :m] = region[:, -m:] = False
    return region


def _full_schedule(scene, region, mode: str, inject: bool = True):
    """FIRST_INIT -> [inject region as WEAK] -> REFINE_INIT -> REFINE_ITER.

    ``mode``: "default" (anchor-center production term), "taps"
    (anchor_taps=3 — production term + the reference's per-view
    sparse-patch candidate taps), or "exact" (per-anchor 9-tap oracle).
    With ``inject=False`` the weak classification is FIRST_INIT's own
    DepthToWeak output — the untouched production loop."""
    ref_cam = scene.cameras[0]
    src_ids = list(range(1, NV))
    src_cams = stack_cameras([scene.cameras[i] for i in src_ids])
    ri = jnp.asarray(scene.images[0])
    si = jnp.asarray(scene.images[src_ids])
    dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min),
                           depth_max=float(ref_cam.depth_max))
    key = jax.random.PRNGKey(0)
    base = dict(num_src=V, cost_backend="exact", rotate_time=2,
                use_edge=False, use_label=False,
                exact_deformable=(mode == "exact"),
                anchor_taps=3 if mode == "taps" else 1)

    st0 = PMStatic(state=RunState.FIRST_INIT, max_iterations=2,
                   **{**base, "exact_deformable": False, "anchor_taps": 1})
    out = out_first = _pass_fn(st0)(ri, si, ref_cam, src_cams, dyn=dyn,
                                    key=key)

    if inject:
        weak = jnp.where(jnp.asarray(region), PixelState.WEAK,
                         jnp.asarray(out.weak))
        weak = jnp.where((weak == PixelState.WEAK) & ~jnp.asarray(region),
                         PixelState.STRONG, weak).astype(jnp.int8)
    else:
        weak = jnp.asarray(out.weak)     # DepthToWeak's own classification

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
    out2 = _pass_fn(st2)(ri, si, ref_cam, src_cams, dyn=dyn,
                         key=jax.random.fold_in(key, 2),
                         src_depths=jnp.asarray(scene.gt_depth[src_ids]),
                         **init_kwargs(out, weak))
    return out2, out_first


def _region_acc(scene, region, out):
    d = np.asarray(out.depth)
    gt = scene.gt_depth[0]
    rel = np.abs(d - gt) / np.maximum(gt, 1e-6)
    n = max(int(region.sum()), 1)
    return float(((rel < 0.02) & (d > 0) & region).sum() / n)


def _run_combo(name: str, mode: str):
    """Run one (scene, mode) combo in THIS process.

    Returns (acc2_final, acc2_after_FIRST_INIT, n_px) over the region —
    final vs init shows how much the weak machinery RECOVERS, not just
    where it lands (the region is injected/classified weak precisely
    because FIRST_INIT cannot solve it photometrically)."""
    spec = SCENES[name]
    dims, kw, inject = spec["dims"], spec["kw"], spec["inject"]
    region = _region_mask(dims, kw)
    assert region.sum() > 50, (name, int(region.sum()))
    scene = make_scene(num_views=NV, height=dims[0], width=dims[1], **kw)
    out, out_first = _full_schedule(scene, region, mode, inject)
    return (_region_acc(scene, region, out),
            _region_acc(scene, region, out_first), int(region.sum()))


_RESULT_TAG = "WEAK_BATTERY_RESULT "


@pytest.fixture(scope="module")
def weak_battery():
    # One subprocess per (scene, mode).  Running the whole battery's ~10
    # largest XLA:CPU executables in ONE process exhausts
    # vm.max_map_count=65530 (XLA code arena: allocateMappedMemory ENOMEM
    # with 124 GB free) and segfaulted the persistent-cache writer right
    # after the "Very slow compile" warnings (round 5).  A fresh process
    # per combo holds <=3 large programs, and the persistent compile
    # cache (safe again under isolation) dedupes shared-shape programs
    # across combos — disc/band/band+noise share every program.
    import os
    import subprocess
    import sys
    import json as _json
    from concurrent.futures import ThreadPoolExecutor

    combos = [(name, m) for name, spec in SCENES.items()
              for m in spec["modes"]]

    def one(combo):
        name, mode = combo
        print(f"[battery] {name} mode={mode} ...", flush=True)
        p = subprocess.run(
            [sys.executable, "-m", "tests.test_weak_battery", name, mode],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for line in reversed(p.stdout.splitlines()):
            if line.startswith(_RESULT_TAG):
                r = _json.loads(line[len(_RESULT_TAG):])
                print(f"[battery] {name} mode={mode} acc2={r['acc']:.3f} "
                      f"({r['dt']:.0f}s)", flush=True)
                return combo, r
        raise RuntimeError(
            f"battery combo {name}/{mode} failed rc={p.returncode}\n"
            f"--- stdout tail ---\n{p.stdout[-2000:]}\n"
            f"--- stderr tail ---\n{p.stderr[-2000:]}")

    with ThreadPoolExecutor(max_workers=2) as ex:
        results = dict(ex.map(one, combos))

    rows = {}
    for name, spec in SCENES.items():
        acc = {m: results[(name, m)]["acc"] for m in spec["modes"]}
        acc["n"] = results[(name, spec["modes"][0])]["n"]
        acc["init"] = results[(name, spec["modes"][0])]["acc0"]
        rows[name] = acc
    lines = ["weak-structure battery (full schedule, V=%d; acc2%% "
             "on the textureless region, final vs FIRST_INIT):" % V]
    for name, acc in rows.items():
        dims = SCENES[name]["dims"]
        tag = "" if SCENES[name]["inject"] else " [no injection]"
        cols = " ".join(f"{m}={acc[m]:.3f}" for m in SCENES[name]["modes"])
        lines.append(f"  {name:11s} {dims[0]}x{dims[1]} init={acc['init']:.3f} "
                     f"{cols} ({acc['n']} px){tag}")
    table = "\n".join(lines)
    print("\n" + table)
    try:  # sidecar dump: the fixture print is easy to lose in CI filters
        import pathlib
        pathlib.Path("/tmp/weak_battery_table.txt").write_text(table + "\n")
    except OSError:
        pass
    jax.config.update("jax_compilation_cache_dir", old_cache)
    return rows


@pytest.mark.slow
@pytest.mark.parametrize("name", list(SCENES))
def test_weak_scene_floor(weak_battery, name):
    acc = weak_battery[name]
    floor_d, floor_e = FLOORS[name]
    assert acc["default"] >= floor_d, (name, "default", acc["default"])
    if "exact" in acc:
        assert acc["exact"] >= floor_e, (name, "exact", acc["exact"])
    # taps mode shares the default's floor: the extra sparse-patch samples
    # must not cost weak-region accuracy (measured table in BASELINE.md)
    if "taps" in acc:
        assert acc["taps"] >= floor_d - 0.05, (name, "taps", acc["taps"])


if __name__ == "__main__":
    # Single-combo subprocess entry used by the weak_battery fixture:
    #   JAX_PLATFORMS=cpu python -m tests.test_weak_battery <scene> <mode>
    # Prints one `WEAK_BATTERY_RESULT {json}` line.  The parent must set
    # JAX_PLATFORMS (conftest does for pytest-spawned runs); jax config
    # is per-process, so mirror conftest's numerics/cache settings here.
    import json as _json
    import os as _os
    import sys as _sys
    import time as _time

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    jax.config.update("jax_default_matmul_precision", "highest")
    if not _os.environ.get("WEAK_BATTERY_NO_CACHE"):
        _cache = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                               "..", ".jax_cache")
        jax.config.update("jax_compilation_cache_dir",
                          _os.path.abspath(_cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    _name, _mode = _sys.argv[1], _sys.argv[2]
    _t0 = _time.time()
    _acc, _acc0, _n = _run_combo(_name, _mode)
    print(_RESULT_TAG + _json.dumps(
        {"scene": _name, "mode": _mode, "acc": _acc, "acc0": _acc0,
         "n": _n, "dt": round(_time.time() - _t0, 1)}), flush=True)
