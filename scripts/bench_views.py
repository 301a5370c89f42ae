"""Source-view scaling: time FIRST_INIT and REFINE_ITER at V source views.

The reference runs up to 20 source views (pair.txt top-20; MAX_IMAGES=32,
/root/reference/main.h:39).  Usage::

    python scripts/bench_views.py [V ...]       # default: 10 20

Prints per-pass times and acc2% at bench geometry (608x800, 3 iterations,
30% weak REFINE) for each view count.

Note (advisor r4): V > 4 is synthesized by CYCLING the scene's 4 source
cameras, so throughput/scaling numbers are representative but the acc2%
and view-selection behavior at V=20 are NOT those of 20 distinct views —
do not read the V=20 accuracy as a fidelity result.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dvpmvs.config import PMDynamic, PMStatic, PixelState, RunState
from dvpmvs.engine import run_pass
from dvpmvs.geometry import stack_cameras
from dvpmvs.priors.edges import edge_segment
from dvpmvs.utils.synthetic import make_scene

H, W = 608, 800
ITERS = 3
VS = [int(a) for a in sys.argv[1:]] or [10, 20]

backend = "pallas" if jax.default_backend() != "cpu" else "exact"
scene = make_scene(num_views=5, height=H, width=W, seed=2)
ref_cam = scene.cameras[0]
ref_img = jnp.asarray(scene.images[0])
gt = scene.gt_depth[0]
m = 8
edge = jnp.asarray(
    edge_segment(0, np.asarray(scene.images[0]), mode=0, use_canny=True) > 0)


def acc2(depth):
    d = np.asarray(depth)[m:-m, m:-m]
    rel = np.abs(d - gt[m:-m, m:-m]) / np.maximum(gt[m:-m, m:-m], 1e-6)
    return float(((rel < 0.02) & (d > 0)).mean())


for V in VS:
    reps = [1 + i % 4 for i in range(V)]
    src_cams = stack_cameras([scene.cameras[i] for i in reps])
    src_imgs = jnp.asarray(scene.images[reps])
    src_depths = jnp.asarray(scene.gt_depth[reps])
    dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min),
                           depth_max=float(ref_cam.depth_max))

    static = PMStatic(state=RunState.FIRST_INIT, num_src=V,
                      max_iterations=ITERS, cost_backend=backend)
    fn = jax.jit(lambda ri, si, dd, kk, eg, s=static: run_pass(
        ri, si, ref_cam, src_cams, s, dd, kk, edge=eg))
    args = (ref_img, src_imgs, dyn, jax.random.PRNGKey(0), edge)
    t0 = time.time()
    out = fn(*args)
    out.depth.block_until_ready()
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        out = fn(*args)
    out.depth.block_until_ready()
    dt = (time.time() - t0) / 3
    print(f"V={V:2d} FIRST_INIT: {dt:6.3f} s/pass ({1/dt:.3f} vps, "
          f"acc2%={acc2(out.depth):.3f}; compile {tc:.0f}s)", flush=True)

    static_r = PMStatic(state=RunState.REFINE_ITER, num_src=V,
                        max_iterations=ITERS, cost_backend=backend,
                        use_APD=True, geom_consistency=True,
                        use_edge=False, use_label=False)
    rng = np.random.default_rng(0)
    n_world = jnp.einsum("ji,hwj->hwi", ref_cam.R,
                         jnp.asarray(scene.gt_normal[0]))
    init_world = jnp.concatenate(
        [n_world, (jnp.asarray(gt) * 1.01)[..., None]], -1)
    sel = jnp.ones((H, W, V), bool)
    weak = jnp.where(jnp.asarray(rng.uniform(size=(H, W)) < 0.3),
                     PixelState.WEAK, PixelState.STRONG).astype(jnp.int8)
    fn_r = jax.jit(lambda ri, si, dd, kk, s=static_r, sd=src_depths,
                   iw=init_world, sl=sel, wk=weak: run_pass(
        ri, si, ref_cam, src_cams, s, dd, kk, init_plane_world=iw,
        init_sel_views=sl, init_weak=wk, src_depths=sd))
    args_r = (ref_img, src_imgs, dyn, jax.random.PRNGKey(0))
    t0 = time.time()
    out_r = fn_r(*args_r)
    out_r.depth.block_until_ready()
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(2):
        out_r = fn_r(*args_r)
    out_r.depth.block_until_ready()
    dt = (time.time() - t0) / 2
    print(f"V={V:2d} REFINE_ITER: {dt:6.3f} s/pass ({1/dt:.3f} vps, "
          f"acc2%={acc2(out_r.depth):.3f}; compile {tc:.0f}s)", flush=True)
