"""Edge-adaptive strong propagation (the use_edge default path) and
extended far propagation: unit semantics + engine-level effect."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvpmvs.config import PMDynamic, PMStatic, RunState
from dvpmvs.engine import run_pass
from dvpmvs.geometry import stack_cameras
from dvpmvs.kernels.propagation import (EDGE_DIRS, edge_candidate_merge,
                                        judge_extend, select_candidates,
                                        select_candidates_edge)
from dvpmvs.kernels.weak import edge_ray_distance
from dvpmvs.utils.synthetic import make_scene


def _plane_field(H, W, seed=0):
    rng = np.random.default_rng(seed)
    n = np.tile(np.asarray([0.0, 0.0, -1.0], np.float32), (H, W, 1))
    w = rng.uniform(1.0, 2.0, (H, W, 1)).astype(np.float32)
    return jnp.asarray(np.concatenate([n, w], -1))


def test_edge_scan_reach_is_edge_limited():
    """A cheap decoy beyond the per-direction reach must not be selected;
    within reach it must (APD.cu:2054-2087: step_num/len from edge dist)."""
    H, W = 64, 96
    plane = _plane_field(H, W)
    cost = jnp.ones((H, W))
    edge = np.zeros((H, W), bool)
    edge[:, 60] = True          # vertical edge
    ed = edge_ray_distance(jnp.asarray(edge))

    p = (32, 30)                # 30 px left of the edge
    # direction 3 = (+1, 0) "right": dist to edge = 30 steps -> step_num 15,
    # step_len 2 -> reach = 5 + 14*2 = 33.  Decoy at +37 (beyond), target
    # at +21 (within).
    cost = cost.at[p[0], p[1] + 37].set(0.01)
    cost = cost.at[p[0], p[1] + 21].set(0.1)
    c1, f1, c2, f2, diff = select_candidates_edge(
        plane, cost, jnp.asarray(edge), ed)
    d_right = EDGE_DIRS.index((1, 0))
    # the adaptive scan picked the +21 candidate (its plane w), not +37
    got = float(c1[d_right, p[0], p[1], 3])
    want = float(plane[p[0], p[1] + 21, 3])
    decoy = float(plane[p[0], p[1] + 37, 3])
    assert got == pytest.approx(want), (got, want, decoy)

    # without the edge the capped reach is max(H,W)/30 = 3.2 -> still 11
    # steps of 2 => reach 25; sanity: the short scan (11 steps) reaches 25
    got2 = float(c2[d_right, p[0], p[1], 3])
    assert got2 == pytest.approx(float(plane[p[0], p[1] + 21, 3]))


def test_edge_merge_prefers_more_good_views():
    H, W, V = 4, 4, 3
    flags = jnp.ones((8, H, W), bool)
    differs = jnp.ones((8, H, W), bool)
    edge = jnp.zeros((H, W), bool)
    ca1 = jnp.full((8, H, W, V), 1.0)          # 0 good views (thr 0.8)
    ca2 = jnp.full((8, H, W, V), 0.5)          # 3 good views
    c1 = jnp.zeros((8, H, W, 4))
    c2 = jnp.ones((8, H, W, 4))
    cost, cand, fl = edge_candidate_merge(
        edge, flags, flags, differs, ca1, ca2, c1, c2, 0)
    assert float(cost[0, 0, 0, 0]) == 0.5
    assert float(cand[0, 0, 0, 0]) == 1.0
    # edge pixels never take the short-range candidate
    cost_e, cand_e, _ = edge_candidate_merge(
        jnp.ones((H, W), bool), flags, flags, differs, ca1, ca2, c1, c2, 0)
    assert float(cost_e[0, 0, 0, 0]) == 1.0
    assert float(cand_e[0, 0, 0, 0]) == 0.0


def test_judge_extend_gates_on_bad_candidates():
    # good candidate (1 view < 0.8, none > 1.2) -> stop extending
    ca = jnp.full((8, 2, 2, 3), 0.5)
    flags = jnp.ones((8, 2, 2), bool)
    assert not bool(judge_extend(0, 0, ca, flags).any())
    # bad candidate (all views 1.0, none good at thr 0.8) -> extend
    ca_bad = jnp.full((8, 2, 2, 3), 1.0)
    assert bool(judge_extend(0, 0, ca_bad, flags).all())
    # flag false -> never
    assert not bool(judge_extend(0, 0, ca_bad,
                                 jnp.zeros((8, 2, 2), bool)).any())


def test_extended_offsets_push():
    _, _, m0 = select_candidates(_plane_field(8, 8), jnp.ones((8, 8)),
                                 jnp.zeros((8, 8, 3)), extend_round=0)
    from dvpmvs.kernels.propagation import DIRECTIONS, _extended_offsets
    far = DIRECTIONS[1]          # up_far [(0,-5)..(0,-13)]
    assert _extended_offsets(far, 0) == far
    assert _extended_offsets(far, 2)[0] == (0, -25)
    diag = DIRECTIONS[0]         # left_up V-sweep, base (-5, -6)
    assert _extended_offsets(diag, 1)[0] == (-13, -14)


def test_edge_map_changes_strong_propagation():
    """Engine level: FIRST_INIT (no weak machinery) with vs without an edge
    map must follow different propagation paths and produce different
    depth maps — the edge prior now gates STRONG propagation, not only the
    weak anchors."""
    H, W = 48, 64
    scene = make_scene(num_views=3, height=H, width=W, seed=3)
    ref_cam = scene.cameras[0]
    src_cams = stack_cameras(scene.cameras[1:])
    dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min),
                           depth_max=float(ref_cam.depth_max))
    st = PMStatic(state=RunState.FIRST_INIT, num_src=2, max_iterations=1,
                  cost_backend="exact", extend_rounds=0)
    edge = np.zeros((H, W), bool)
    edge[::9] = True
    args = (jnp.asarray(scene.images[0]), jnp.asarray(scene.images[1:]),
            ref_cam, src_cams, st, dyn, jax.random.PRNGKey(0))
    out_e = run_pass(*args, edge=jnp.asarray(edge))
    out_p = run_pass(*args)
    de = np.asarray(out_e.depth)
    dp = np.asarray(out_p.depth)
    assert (de != dp).mean() > 0.05
    assert np.isfinite(de).all()
