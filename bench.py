"""Benchmark: PatchMatch view-passes per second on one chip.

Runs a full FIRST_INIT PatchMatch pass (random init + 3 checkerboard
iterations + median/reclassify/refine post-passes) on a synthetic scene at
the reference's working resolution (pyramid base <= 800 px, ~10 source
views — BASELINE.md config 1 scale) and reports depth-maps/sec/chip.
The pass runs the reference's DEFAULT strong-propagation path: the
edge-adaptive dual scan (use_edge=true in main.h; edges computed per round
by main.cpp:480), with a Canny edge map of the scene.

vs_baseline anchors to an estimated 0.33 view-passes/sec for the reference
CUDA engine on its published dev hardware (Titan RTX): the repo publishes no
numbers (BASELINE.md), and per-view "Cost time" prints of APD-family engines
at this scale are ~2-4 s/view-pass.  The anchor is recorded here explicitly
so it can be replaced by a measured value when the reference is run.

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_VIEW_PASSES_PER_SEC = 0.33   # Titan RTX estimate (see docstring)

H, W, V = 608, 800, 10
ITERS = 3


def main():
    from dvpmvs.config import PMDynamic, PMStatic, RunState
    from dvpmvs.engine import run_pass
    from dvpmvs.geometry import stack_cameras
    from dvpmvs.utils.synthetic import make_scene

    backend = "pallas" if jax.default_backend() != "cpu" else "exact"
    scene = make_scene(num_views=5, height=H, width=W, seed=2)
    ref_cam = scene.cameras[0]
    src_ids = [1, 2, 3, 4]
    # replicate to V source views (synthetic scene has 4 distinct sources;
    # arithmetic cost matches a 10-view problem)
    reps = [src_ids[i % len(src_ids)] for i in range(V)]
    src_cams = stack_cameras([scene.cameras[i] for i in reps])
    src_imgs = jnp.asarray(scene.images[reps])

    static = PMStatic(state=RunState.FIRST_INIT, num_src=V,
                      max_iterations=ITERS, cost_backend=backend)
    dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min),
                           depth_max=float(ref_cam.depth_max))

    from dvpmvs.priors.edges import edge_segment
    edge = jnp.asarray(
        edge_segment(0, np.asarray(scene.images[0]), mode=0,
                     use_canny=True) > 0)

    fn = jax.jit(lambda ri, si, rc, sc, dd, kk, eg: run_pass(
        ri, si, rc, sc, static, dd, kk, edge=eg))
    args = (jnp.asarray(scene.images[0]), src_imgs, ref_cam, src_cams, dyn,
            jax.random.PRNGKey(0), edge)

    out = fn(*args)
    out.depth.block_until_ready()          # compile + warm
    n_runs = 2
    t0 = time.time()
    for _ in range(n_runs):
        out = fn(*args)
    out.depth.block_until_ready()
    dt = (time.time() - t0) / n_runs

    # sanity: the pass must actually solve the scene
    gt = scene.gt_depth[0]
    d = np.asarray(out.depth)
    m = 8
    rel = np.abs(d[m:-m, m:-m] - gt[m:-m, m:-m]) / np.maximum(gt[m:-m, m:-m], 1e-6)
    acc = float(((rel < 0.02) & (d[m:-m, m:-m] > 0)).mean())

    vps = 1.0 / dt
    print(json.dumps({
        "metric": "depth_maps_per_sec_per_chip",
        "value": round(vps, 4),
        "unit": f"view-pass/s ({H}x{W}, {V} src views, {ITERS} iters; "
                f"acc2%={acc:.3f})",
        "vs_baseline": round(vps / REFERENCE_VIEW_PASSES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
