"""Multi-host scheduling: problem partitioning + file-based cross-host sync.

True multi-process runs need a pod; here two MultiHostRunner instances with
process_index 0/1 share one checkpoint directory in a single process and are
stepped pass-by-pass — exactly the synchronization pattern of a 2-host run
(barriers are no-ops single-process; the file sync is what's under test).
"""

import jax
import numpy as np

from dvpmvs.config import PMStatic, SceneConfig
from dvpmvs.dist.multihost import MultiHostRunner, host_problems
from dvpmvs.io import load_scene
from dvpmvs.utils.synthetic import make_scene, write_scene_dir


def test_host_problems_partition():
    probs = list(range(7))
    slices = [host_problems(probs, pi, 3) for pi in range(3)]
    assert sorted(sum(slices, [])) == probs
    assert all(len(s) in (2, 3) for s in slices)


def test_two_host_file_sync(tmp_path):
    scene_s = make_scene(num_views=4, height=32, width=48, seed=5)
    folder = write_scene_dir(scene_s, tmp_path / "dense")
    cfg = SceneConfig(geometric_passes=1, seed=0)
    static = PMStatic(max_iterations=1)
    ck = tmp_path / "ckpt"

    hosts = [
        MultiHostRunner(load_scene(folder, max_src_views=2), cfg,
                        base_static=static, checkpoint_dir=ck,
                        process_index=pi, process_count=2, verbose=False)
        for pi in range(2)
    ]
    owned = [sorted(p.ref_image_id for p in h.scene.problems) for h in hosts]
    assert owned[0] == [0, 2] and owned[1] == [1, 3]

    key = jax.random.PRNGKey(0)
    for rnd in range(hosts[0].rounds):
        for pass_idx in range(2):
            for h in hosts:
                h.run_schedule_pass(rnd, pass_idx, key)
            for h in hosts:           # every host writes its owned views...
                h.checkpoint(ck)
            for h in hosts:           # ...then (post-barrier) pulls foreign
                h._sync_foreign_views(ck)   # views; sequential here stands
                                            # in for the real barrier

    # after sync each host has state for ALL views it needs
    for h in hosts:
        needed = {s for p in h.scene.problems for s in p.src_image_ids}
        assert needed <= set(h.state)

    # host 0's copy of view 1 equals host 1's own state (file round-trip)
    np.testing.assert_array_equal(hosts[0].state[1].depth,
                                  hosts[1].state[1].depth)
    # geometric pass actually consumed real source depths: depth maps solve
    # the scene about as well as the single-host pipeline test expects
    gt = scene_s.gt_depth[0]
    d = hosts[0].state[0].depth
    m = 6
    rel = np.abs(d[m:-m, m:-m] - gt[m:-m, m:-m]) / gt[m:-m, m:-m]
    assert ((rel < 0.05) & (d[m:-m, m:-m] > 0)).mean() > 0.3
