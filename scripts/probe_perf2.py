"""Microbench: RNG impl effect + fused DSPAN variants + stage pieces."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

impl = sys.argv[1] if len(sys.argv) > 1 else "threefry2x32"
jax.config.update("jax_default_prng_impl", impl)

from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import dist_to_origin
from dvpmvs.kernels.ncc import build_cost_context
from dvpmvs.kernels.refine import refinement_planes
from dvpmvs.kernels.sampling import random_unit_normals, visibility_prior_normal
from dvpmvs.utils.synthetic import make_scene

H, W, V = 608, 800, 10
scene = make_scene(num_views=5, height=H, width=W, seed=2)
ref_cam = scene.cameras[0]
reps = [1 + i % 4 for i in range(V)]
src_cams = stack_cameras([scene.cameras[i] for i in reps])
ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
rx = (xs - ref_cam.cx) / ref_cam.fx
ry = (ys - ref_cam.cy) / ref_cam.fy
n = jnp.asarray(scene.gt_normal[0]); d0 = jnp.asarray(scene.gt_depth[0])
sel = jnp.ones((H, W, V), bool)
key = jax.random.PRNGKey(0)

def timeit(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    print(f"[{impl}] {name:28s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)
    return out

timeit("refinement_planes", jax.jit(lambda k: refinement_planes(
    k, n, d0, sel, rx, ry, xs, ys, ref_cam, src_cams, 1.0, 8.0)), key)
timeit("random_unit_normals x8", jax.jit(
    lambda k: random_unit_normals(k, (8, H, W))), key)
timeit("vis_prior_normal", jax.jit(lambda k: visibility_prior_normal(
    k, d0, sel, rx, ry, ref_cam, src_cams)), key)
timeit("uniform HW", jax.jit(
    lambda k: jax.random.uniform(k, (H, W))), key)
