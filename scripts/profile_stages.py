"""Time each stage of the FIRST_INIT pass separately on the current backend."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from dvpmvs.config import PMDynamic, PMStatic, RunState, PixelState
from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import depth_from_plane, dist_to_origin
from dvpmvs.kernels.ncc import build_cost_context, ncc_cost, ncc_cost_batch
from dvpmvs.kernels.median import median_filter_depth
from dvpmvs.kernels.propagation import select_candidates, mhjvs, neighbor_prior, weighted_cost
from dvpmvs.kernels.refine import refinement_planes
from dvpmvs.kernels.sweep import depth_to_weak, local_refine
from dvpmvs.utils.synthetic import make_scene

H, W, V = (int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3 else (608, 800, 10)
backend = sys.argv[4] if len(sys.argv) > 4 else "pallas"

scene = make_scene(num_views=5, height=H, width=W, seed=2)
ref_cam = scene.cameras[0]
reps = [1 + i % 4 for i in range(V)]
src_cams = stack_cameras([scene.cameras[i] for i in reps])
src_imgs = jnp.asarray(scene.images[reps])
ref_img = jnp.asarray(scene.images[0])
dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min) * 0.6,
                       depth_max=float(ref_cam.depth_max) * 1.2)
static = PMStatic(state=RunState.FIRST_INIT, num_src=V, max_iterations=3,
                  cost_backend=backend)

ys = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None], (H, W))
xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :], (H, W))
rx = (xs - ref_cam.cx) / ref_cam.fx
ry = (ys - ref_cam.cy) / ref_cam.fy
ray = jnp.stack([rx, ry, jnp.ones_like(rx)], -1)
ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)

n = jnp.asarray(scene.gt_normal[0]); d0 = jnp.asarray(scene.gt_depth[0])
w = dist_to_origin(n, xs, ys, d0, ref_cam)
plane = jnp.concatenate([n, w[..., None]], -1)
cost = jnp.zeros((H, W))
sel = jnp.ones((H, W, V), bool)
weak = jnp.full((H, W), PixelState.STRONG, jnp.int8)
vw = jnp.ones((H, W, V))
key = jax.random.PRNGKey(0)

mkctx = jax.jit(lambda ri, si: build_cost_context(
    ri, si, ref_cam, src_cams, 5.0, 3.0, backend=backend))
ctx = jax.block_until_ready(mkctx(ref_img, src_imgs))


def timeit(name, fn, *args, n=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    print(f"{name:28s} {(time.time()-t0)/n*1e3:9.1f} ms", flush=True)
    return out


# 1. single cost eval [V]
timeit("ncc_cost (1 plane)", jax.jit(lambda p: ncc_cost(ctx, p)), plane)

# 2. batched 9-plane eval
planes9 = jnp.tile(plane[None], (9, 1, 1, 1))
timeit("ncc_cost_batch (9 planes)", jax.jit(lambda p: ncc_cost_batch(ctx, p)), planes9)
planes6 = planes9[:6]
timeit("ncc_cost_batch (6 planes)", jax.jit(lambda p: ncc_cost_batch(ctx, p)), planes6)

# 3. select_candidates
timeit("select_candidates", jax.jit(lambda p, c: select_candidates(p, c, ray)), plane, cost)

# 4. mhjvs
ca = jnp.zeros((8, H, W, V)); flags = jnp.ones((8, H, W), bool)
prior = jnp.ones((H, W, V))
timeit("mhjvs", jax.jit(lambda k, c, f, pr: mhjvs(k, c, f, pr, 0)), key, ca, flags, prior)

# 5. refinement plane generation
timeit("refinement_planes", jax.jit(lambda k: refinement_planes(
    k, plane[..., :3], d0, sel, rx, ry, xs, ys, ref_cam, src_cams,
    dyn.depth_min, dyn.depth_max)), key)

# 6. median filter
timeit("median_filter", jax.jit(lambda d, wk, c: median_filter_depth(d, wk, c)), d0, weak, cost)

# 7. depth_to_weak
timeit("depth_to_weak", jax.jit(lambda nn, dd: depth_to_weak(
    ctx, None, dyn.geom_factor, nn, dd, sel, vw, xs, ys, ref_cam, src_cams,
    dyn.depth_min, dyn.depth_max, dyn.weak_peak_radius)), n, d0)

# 8. local_refine
timeit("local_refine", jax.jit(lambda nn, dd: local_refine(
    ctx, None, dyn.geom_factor, nn, dd, sel, vw, xs, ys, ref_cam, src_cams,
    dyn.depth_min, dyn.depth_max)), n, d0)

# 9. build ctx itself
timeit("build_cost_context", mkctx, ref_img, src_imgs)
