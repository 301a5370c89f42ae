"""Distribution-layer tests on the virtual 8-device CPU mesh.

Phase A (views sharded) is exercised by __graft_entry__.dryrun_multichip and
tests/test_engine.py; here we cover Phase B (tile sharding of one view) and
the 2-D composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvpmvs.config import PMDynamic, PMStatic, RunState
from dvpmvs.dist.tiles import make_mesh2, make_tiled_pass
from dvpmvs.engine import run_pass
from dvpmvs.geometry import stack_cameras
from dvpmvs.utils.synthetic import make_scene
from jax.sharding import Mesh


def _problem(H=32, W=48, n_views=3):
    scene = make_scene(num_views=n_views, height=H, width=W, seed=3)
    ref_cam = scene.cameras[0]
    src_ids = list(range(1, n_views))
    src_cams = stack_cameras([scene.cameras[i] for i in src_ids])
    dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min),
                           depth_max=float(ref_cam.depth_max))
    return (jnp.asarray(scene.images[0]), jnp.asarray(scene.images[src_ids]),
            ref_cam, src_cams, dyn)


@pytest.mark.slow
def test_tiled_pass_matches_untiled():
    devs = jax.devices()
    assert len(devs) >= 4
    mesh = Mesh(np.asarray(devs[:4]), ("tile",))
    static = PMStatic(state=RunState.FIRST_INIT, num_src=2,
                      max_iterations=1, cost_backend="exact")
    ref_img, src_imgs, ref_cam, src_cams, dyn = _problem()
    key = jax.random.PRNGKey(0)

    ref = run_pass(ref_img, src_imgs, ref_cam, src_cams, static, dyn, key)
    tiled_fn = make_tiled_pass(static, mesh)
    out = tiled_fn(ref_img, src_imgs, ref_cam, src_cams, dyn, key)

    # Tiled and untiled are bitwise equal in practice; PatchMatch is chaotic
    # under float reassociation, so assert statistically (SURVEY §7: validate
    # statistically, not bitwise).
    d1 = np.asarray(ref.depth)
    d2 = np.asarray(out.depth)
    rel = np.abs(d1 - d2) / np.maximum(np.abs(d1), 1e-6)
    assert np.mean(rel > 1e-3) < 0.005
    agree = np.mean(np.asarray(out.weak) == np.asarray(ref.weak))
    assert agree > 0.99


@pytest.mark.slow
def test_device_resident_geom_pass_matches_host(tmp_path):
    """A round's geometric pass fed from device-resident state (init +
    exchange_src_depths all-gather) must equal the host-rebuild path
    bitwise — same values, different residency (VERDICT r2 item 3;
    reference sync point APD.cpp:1147-1166)."""
    from dvpmvs.config import PMStatic, SceneConfig
    from dvpmvs.io import load_scene
    from dvpmvs.sched import SceneRunner
    from dvpmvs.utils.synthetic import make_scene, write_scene_dir

    scene_s = make_scene(num_views=4, height=32, width=48, seed=6)
    folder = write_scene_dir(scene_s, tmp_path / "dense")
    static = PMStatic(max_iterations=1, cost_backend="exact",
                      use_edge=False, extend_rounds=0, use_label=False)
    key = jax.random.PRNGKey(0)

    def make_runner():
        return SceneRunner(load_scene(folder, max_src_views=2),
                           SceneConfig(geometric_passes=1, seed=0,
                                       mesh_views=2),
                           base_static=static, verbose=False)

    ra = make_runner()
    ra.run_schedule_pass(0, 0, key)
    assert ra._dev is not None
    ra.run_schedule_pass(0, 1, key)
    assert ra._last_pass_device_resident

    rb = make_runner()
    rb.run_schedule_pass(0, 0, key)
    rb._dev = None                       # force the host-rebuild path
    rb.run_schedule_pass(0, 1, key)
    assert not rb._last_pass_device_resident

    for v in ra.state:
        np.testing.assert_array_equal(ra.state[v].depth, rb.state[v].depth)
        np.testing.assert_array_equal(ra.state[v].weak, rb.state[v].weak)
        np.testing.assert_array_equal(ra.state[v].sel_views,
                                      rb.state[v].sel_views)


@pytest.mark.slow
def test_runner_mesh_tiles_matches_untiled(tmp_path):
    """SceneRunner with config.mesh_tiles=2 (the --mesh-tiles CLI path)
    must reproduce the untiled schedule statistically (float reassociation
    only) — VERDICT r2 item 8."""
    from dvpmvs.config import PMStatic, SceneConfig
    from dvpmvs.io import load_scene
    from dvpmvs.sched import SceneRunner
    from dvpmvs.utils.synthetic import make_scene, write_scene_dir

    scene_s = make_scene(num_views=3, height=32, width=48, seed=8)
    folder = write_scene_dir(scene_s, tmp_path / "dense")
    static = PMStatic(max_iterations=1, cost_backend="exact",
                      use_edge=False, extend_rounds=0, use_label=False)
    key = jax.random.PRNGKey(0)

    def run(n_tiles):
        r = SceneRunner(load_scene(folder, max_src_views=2),
                        SceneConfig(geometric_passes=1, seed=0,
                                    mesh_tiles=n_tiles),
                        base_static=static, verbose=False)
        r.run_schedule_pass(0, 0, key)
        snap = {v: st.depth.copy() for v, st in r.state.items()}
        r.run_schedule_pass(0, 1, key)
        return r, snap

    (ra, snap_a), (rb, snap_b) = run(2), run(1)
    # after ONE pass: tiled == untiled up to float reassociation on
    # scattered pixels (PatchMatch adoption flips on ties; a second pass
    # amplifies those chaotically, so the strict check is single-pass)
    for v in snap_a:
        rel = np.abs(snap_a[v] - snap_b[v]) / np.maximum(
            np.abs(snap_b[v]), 1e-6)
        assert np.mean(rel > 1e-3) < 0.01, v
    # after the geometric pass both runs must solve the scene equally well
    for v in ra.state:
        gt = scene_s.gt_depth[v]
        m = 6
        for r in (ra, rb):
            d = r.state[v].depth[m:-m, m:-m]
            rel = np.abs(d - gt[m:-m, m:-m]) / gt[m:-m, m:-m]
            assert ((rel < 0.05) & (d > 0)).mean() > 0.5, v


def test_mesh2_composition():
    mesh = make_mesh2(2, 4)
    assert mesh.shape == {"views": 2, "tile": 4}
    with pytest.raises(ValueError):
        make_mesh2(4, 4)


def test_tiled_pass_rejects_indivisible_rows():
    devs = jax.devices()
    mesh = Mesh(np.asarray(devs[:4]), ("tile",))
    static = PMStatic(state=RunState.FIRST_INIT, num_src=2,
                      max_iterations=1, cost_backend="exact")
    ref_img, src_imgs, ref_cam, src_cams, dyn = _problem(H=30, W=48)
    fn = make_tiled_pass(static, mesh)
    with pytest.raises(ValueError):
        fn(ref_img, src_imgs, ref_cam, src_cams, dyn, jax.random.PRNGKey(0))


@pytest.mark.slow
def test_apd_pass_sharded_matches_unsharded():
    """The FULL weak machinery (use_APD: anchors, RANSAC fit, deformable
    slot costs, weak compaction + scatter) under the views mesh produces
    the per-view results — the compaction (jnp.nonzero size= + scatter-
    drop) is the likeliest GSPMD breakage (round-3 verdict item 3)."""
    import jax.tree_util as jtu

    from dvpmvs.config import PixelState
    from dvpmvs.dist.mesh import make_mesh
    from dvpmvs.dist.sharding import make_batched_pass, shard_problems

    devs = jax.devices()
    assert len(devs) >= 4
    B, H, W, V = 4, 32, 48, 2
    mesh = make_mesh(4)
    static = PMStatic(state=RunState.REFINE_INIT, num_src=V,
                      max_iterations=1, cost_backend="exact", use_APD=True,
                      rotate_time=2, use_edge=False, use_label=False)
    scene = make_scene(num_views=4, height=H, width=W, seed=3)
    cams = scene.cameras

    refs = jnp.asarray(np.stack([scene.images[i] for i in range(B)]))
    srcs = jnp.asarray(np.stack(
        [scene.images[[(i + 1) % 4, (i + 2) % 4]] for i in range(B)]))
    ref_cams = jtu.tree_map(lambda *x: jnp.stack(x),
                            *[cams[i] for i in range(B)])
    src_cams_l = [stack_cameras([cams[(i + 1) % 4], cams[(i + 2) % 4]])
                  for i in range(B)]
    src_cams = jtu.tree_map(lambda *x: jnp.stack(x), *src_cams_l)
    dyn1 = PMDynamic.create(depth_min=float(cams[0].depth_min),
                            depth_max=float(cams[0].depth_max))
    dyn = jtu.tree_map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), dyn1)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    rng = np.random.default_rng(0)
    n_w = np.stack([np.einsum("ji,hwj->hwi", np.asarray(cams[i].R),
                              scene.gt_normal[i]) for i in range(B)])
    ipw = jnp.asarray(np.concatenate(
        [n_w, scene.gt_depth[:B, ..., None] * 1.02], -1))
    isel = jnp.ones((B, H, W, V), bool)
    iweak = jnp.asarray(
        np.where(rng.uniform(size=(B, H, W)) < 0.3, PixelState.WEAK,
                 PixelState.STRONG).astype(np.int8))

    fn = make_batched_pass(static, mesh)
    args = shard_problems((refs, srcs, ref_cams, src_cams, dyn, keys,
                           ipw, isel, iweak), mesh)
    out = fn(*args)
    assert "views" in str(out.depth.sharding)

    # per-view unsharded references (same static -> same program per view)
    for i in range(B):
        ref = run_pass(refs[i], srcs[i], cams[i], src_cams_l[i], static,
                       dyn1, keys[i],
                       init_plane_world=ipw[i], init_sel_views=isel[i],
                       init_weak=iweak[i])
        d1 = np.asarray(ref.depth)
        d2 = np.asarray(out.depth[i])
        rel = np.abs(d1 - d2) / np.maximum(np.abs(d1), 1e-6)
        assert np.mean(rel > 1e-3) < 0.005, f"view {i}"
        agree = np.mean(np.asarray(out.weak[i]) == np.asarray(ref.weak))
        assert agree > 0.99, f"view {i}"
