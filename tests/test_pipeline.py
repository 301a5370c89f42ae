"""Golden pipeline test: scene dir -> runner (photometric + geometric) ->
fusion -> point cloud near GT surfaces."""

import numpy as np
import pytest

from dvpmvs.config import PMStatic, SceneConfig
from dvpmvs.fusion import run_fusion
from dvpmvs.io import load_scene
from dvpmvs.sched import SceneRunner
from dvpmvs.utils.synthetic import make_scene, write_scene_dir


@pytest.fixture(scope="module")
def fused(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scene")
    scene_s = make_scene(num_views=3, height=48, width=64, seed=9)
    folder = write_scene_dir(scene_s, tmp / "dense")
    scene = load_scene(folder, max_src_views=2)
    cfg = SceneConfig(geometric_passes=1, seed=0)
    runner = SceneRunner(scene, cfg,
                         base_static=PMStatic(max_iterations=2),
                         verbose=False)
    assert runner.rounds == 1
    runner.run(checkpoint_dir=tmp / "ckpt")
    pts, cols = run_fusion(runner.fusion_inputs(), variant="eth3d",
                           out_ply=str(tmp / "cloud.ply"))
    return scene_s, runner, pts, cols, tmp


def test_runner_depth_accuracy(fused):
    scene_s, runner, *_ = fused
    m = 8
    accs = []
    for v in range(3):
        gt = scene_s.gt_depth[v]
        d = runner.state[v].depth
        rel = np.abs(d[m:-m, m:-m] - gt[m:-m, m:-m]) / gt[m:-m, m:-m]
        accs.append(((rel < 0.02) & (d[m:-m, m:-m] > 0)).mean())
    # tiny 2-src problems are view-luck dependent; the pipeline must solve
    # the scene overall (fusion filters the rest)
    assert max(accs) > 0.7, accs
    assert np.mean(accs) > 0.45, accs


def test_fusion_points_on_surface(fused):
    scene_s, _, pts, cols, _ = fused
    assert len(pts) > 30, len(pts)
    # each fused point must lie near one of the GT world planes (the
    # consistency filter only passes multi-view-confirmed geometry)
    dists = np.abs(pts @ scene_s.planes_n.T
                   + scene_s.planes_d[None, :])       # [N, P]
    min_d = dists.min(axis=1)
    assert np.median(min_d) < 0.06, np.median(min_d)
    assert (min_d < 0.15).mean() > 0.7
    assert cols.shape == pts.shape and cols.dtype == np.uint8


def test_fusion_gt_inputs_dense(fused):
    """With GT depth/normals the ETH3D filter passes most interior pixels
    and every point lies exactly on a GT plane."""
    scene_s, runner, *_ = fused
    import dataclasses
    from dvpmvs.config import PixelState
    from dvpmvs.fusion import FusionInputs

    ids = [0, 1, 2]
    normals = {v: scene_s.gt_normal[v] @ np.asarray(scene_s.cameras[v].R)
               for v in ids}
    inp = FusionInputs(
        images={v: np.repeat(scene_s.images[v].astype(np.uint8)[..., None],
                             3, -1) for v in ids},
        cameras={v: scene_s.cameras[v] for v in ids},
        depths={v: scene_s.gt_depth[v] for v in ids},
        normals=normals,
        weaks={v: np.full(scene_s.gt_depth[v].shape, PixelState.STRONG,
                          np.int8) for v in ids},
        problems=[type("P", (), {"ref_image_id": i,
                                 "src_image_ids": [j for j in ids if j != i]})
                  for i in ids])
    pts, _ = run_fusion(inp, "eth3d")
    assert len(pts) > 2000
    d = np.abs(pts @ scene_s.planes_n.T + scene_s.planes_d[None]).min(1)
    assert np.median(d) < 1e-3
    pts_t, _ = run_fusion(inp, "tat_intermediate")
    assert len(pts_t) > 100
    pts_a, _ = run_fusion(inp, "tat_advanced")
    assert len(pts_a) > 100


def test_sharded_fusion_matches_serial(fused):
    """The deterministic-ownership parallel fusion must reproduce the
    serial greedy variant's cloud up to the documented consumption
    deviation: point count within 10%, and every point near a GT plane
    (VERDICT r2 item 6; reference serialization APD.cpp:1936-1952)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from dvpmvs.fusion import run_fusion_sharded

    scene_s, runner, pts_serial, *_ = fused
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("views",))
    pts, cols = run_fusion_sharded(runner.fusion_inputs(), "eth3d",
                                   mesh=mesh)
    n_s, n_p = len(pts_serial), len(pts)
    assert abs(n_p - n_s) <= max(0.1 * n_s, 20), (n_p, n_s)
    d = np.abs(pts @ scene_s.planes_n.T + scene_s.planes_d[None]).min(1)
    assert np.median(d) < 0.06
    assert cols.shape == pts.shape and cols.dtype == np.uint8


def test_checkpoint_files(fused):
    *_, tmp = fused
    from dvpmvs.io import read_bin_mat
    d = read_bin_mat(tmp / "ckpt" / "00000000" / "depths.dmb")
    assert d.shape == (48, 64)
    w = read_bin_mat(tmp / "ckpt" / "00000000" / "weak.bin")
    assert w.dtype == np.uint8
    sv = read_bin_mat(tmp / "ckpt" / "00000000" / "selected_views.bin")
    assert sv.dtype == np.int32
    # final-pass benchmark-format outputs (reference iteration==15 extras)
    from dvpmvs.io.dmb import read_dmb
    dg = read_dmb(tmp / "ckpt" / "00000000" / "depths_geom.dmb")
    assert dg.shape == (48, 64)
    nm = read_dmb(tmp / "ckpt" / "00000000" / "normals.dmb")
    assert nm.shape == (48, 64, 3)
    assert (tmp / "ckpt" / "00000000" / "weak.png").exists()


def test_checkpoint_resume(fused):
    """A fresh runner resumes from the checkpoint and skips completed passes."""
    from dvpmvs.io import load_scene

    scene_s, runner, _, _, tmp = fused
    scene = load_scene(tmp / "dense", max_src_views=2)
    cfg = SceneConfig(geometric_passes=1, seed=0)
    r2 = SceneRunner(scene, cfg, base_static=PMStatic(max_iterations=2),
                     verbose=False)
    r2.run(checkpoint_dir=tmp / "ckpt", resume=True)
    # all passes were already done: state reloaded, nothing recomputed
    assert r2.iteration == runner.iteration
    for v in runner.state:
        np.testing.assert_array_equal(r2.state[v].depth,
                                      runner.state[v].depth)
        np.testing.assert_array_equal(r2.state[v].weak, runner.state[v].weak)
        np.testing.assert_array_equal(r2.state[v].sel_views,
                                      runner.state[v].sel_views)


def test_metrics_recorded(fused, tmp_path):
    _, runner, *_ = fused
    s = runner.metrics.summary()
    assert s["counters"]["view_passes"] == 3 * runner.iteration
    assert any(k.startswith("round0/") for k in s["timings"])
    runner.metrics.dump(tmp_path / "metrics.json")
    import json
    assert json.loads((tmp_path / "metrics.json").read_text())["counters"]


@pytest.mark.slow
def test_mono_prior_end_to_end(tmp_path):
    """`dvpmvs prior` writes dep/ maps (DA-V2 run natively) and the scene
    pipeline's FIRST_INIT consumes them with sfm/ alignment
    (APD.cpp:1210-1424)."""
    from dvpmvs.cli.run import main as cli_main

    scene_s = make_scene(num_views=3, height=32, width=40, seed=4)
    folder = write_scene_dir(scene_s, tmp_path / "dense", with_sfm=True,
                             sfm_points=80)
    # random-weight DA-V2 (no checkpoint available offline): validates the
    # native inference + dep/ writing path
    assert cli_main(["prior", str(folder), "--tiny"]) == 0
    for v in range(3):
        assert (folder / "dep" / f"{v:08d}.dmb").exists()

    # FIRST_INIT with the generated prior: mono_prior_planes must parse the
    # dep/ + sfm/ pair and produce a usable init (pipeline runs through)
    assert cli_main(["scene", str(folder), "--mono-prior",
                     "--iterations", "1", "--geometric-passes", "1",
                     "--backend", "exact", "--max-src-views", "2"]) == 0
    assert (folder / "APD" / "APD.ply").exists()
