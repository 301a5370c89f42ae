"""Schedule fidelity: pass parameters against the reference table
(main.cpp:450-512, main.h:86-112) and the R-1 round count."""

import numpy as np
import pytest

from dvpmvs.config import (PMStatic, RunState, SceneConfig, num_rounds_for,
                           round_pass_params)


def test_defaults_match_main_h():
    st = PMStatic()
    # main.h:99-106: the prior/feature flags default ON and are never
    # cleared by the schedule
    assert st.use_edge and st.use_limit and st.use_label and st.use_radius
    assert not st.use_detail
    assert st.max_iterations == 3 and st.top_k == 4
    assert st.strong_radius == 5 and st.strong_increment == 2
    assert st.weak_radius == 5 and st.weak_increment == 5
    assert st.rotate_time == 4


@pytest.mark.parametrize("i", [0, 1, 2, 3])
def test_round_pass_params_reference_table_r4(i):
    R = 4
    base = PMStatic()
    # photometric pass
    st, dyn = round_pass_params(i, R, 0, base, 0.0, 1.0)
    if i == 0:
        assert st.state == RunState.FIRST_INIT and not st.use_APD
    else:
        assert st.state == RunState.REFINE_INIT and st.use_APD
        assert st.rotate_time == min(2 ** i, 4)
        assert st.use_detail == (i < R - 1)
        assert float(dyn.ransac_threshold) == pytest.approx(
            0.01 - i * 0.00125)
    assert not st.geom_consistency
    assert float(dyn.weak_peak_radius) == 6.0
    # geometric passes (main.cpp:485-510)
    for j in range(3):
        st, dyn = round_pass_params(i, R, 1 + j, base, 0.0, 1.0)
        assert st.state == RunState.REFINE_ITER
        assert st.geom_consistency
        assert st.use_APD == (i > 0)
        assert float(dyn.weak_peak_radius) == max(4 - 2 * j, 2)
        assert float(dyn.ransac_threshold) == pytest.approx(
            0.01 - i * 0.00125)


def test_round_count_runs_r_minus_1():
    """main.cpp:450 stops at i < round_num - 1 (finest processed scale 2)."""
    from dvpmvs.io.scene import Problem, Scene
    from dvpmvs.sched import SceneRunner
    from pathlib import Path

    H, W = 40, 3300          # maxdim 3300 -> rounds: 3300>800 -> 3 halvings
    imgs = {0: np.zeros((H, W), np.float32)}
    from dvpmvs.utils.synthetic import make_scene
    cam = make_scene(num_views=2, height=32, width=32, seed=0).cameras[0]
    scene = Scene(dense_folder=Path("."), image_ids=[0], images=imgs,
                  colors={}, cameras={0: cam},
                  problems=[Problem(index=0, ref_image_id=0,
                                    src_image_ids=[0],
                                    dense_folder=Path("."),
                                    result_folder=Path("."))])
    assert num_rounds_for(W, H) == 4
    r = SceneRunner(scene, SceneConfig(), verbose=False)
    assert r.rounds == 4 and r.rounds_to_run == 3
    r2 = SceneRunner(scene, SceneConfig(full_res_round=True), verbose=False)
    assert r2.rounds_to_run == 4
    # tiny scenes (round_num == 1) still run one round
    imgs_s = {0: np.zeros((40, 60), np.float32)}
    scene.images = imgs_s
    r3 = SceneRunner(scene, SceneConfig(), verbose=False)
    assert r3.rounds == 1 and r3.rounds_to_run == 1
