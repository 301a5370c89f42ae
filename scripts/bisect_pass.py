import time, sys, jax, jax.numpy as jnp, numpy as np
from dvpmvs.config import PMDynamic, PMStatic, RunState, PixelState
from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import dist_to_origin
from dvpmvs.kernels.ncc import build_cost_context, ncc_cost, ncc_cost_batch
from dvpmvs.kernels.propagation import select_candidates, mhjvs, weighted_cost
from dvpmvs.kernels.refine import refinement_planes
from dvpmvs.kernels.median import median_filter_depth
from dvpmvs.kernels.sweep import depth_to_weak, local_refine
from dvpmvs.utils.synthetic import make_scene

H, W = int(sys.argv[1]), int(sys.argv[2])
scene = make_scene(num_views=5, height=H, width=W, seed=2)
ref_cam = scene.cameras[0]
src_ids = [1, 2, 3, 4]
src_cams = stack_cameras([scene.cameras[i] for i in src_ids])
ref_img = jnp.asarray(scene.images[0])
src_imgs = jnp.asarray(scene.images[src_ids])
V = 4
ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
rx = (xs - ref_cam.cx) / ref_cam.fx
ry = (ys - ref_cam.cy) / ref_cam.fy
ray = jnp.stack([rx, ry, jnp.ones_like(rx)], -1)
ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
n = jnp.asarray(scene.gt_normal[0]); d = jnp.asarray(scene.gt_depth[0])
w = dist_to_origin(n, xs, ys, d, ref_cam)
plane = jnp.concatenate([n, w[..., None]], -1)
key = jax.random.PRNGKey(0)
sel = jnp.ones((H, W, V), bool)
vw = jnp.ones((H, W, V), jnp.float32)
weak = jnp.full((H, W), PixelState.STRONG, jnp.int8)
cost = jnp.zeros((H, W))

mk_ctx = jax.jit(lambda ri, si, rc, sc: build_cost_context(ri, si, rc, sc, 5.0, 3.0))
ctx = jax.block_until_ready(mk_ctx(ref_img, src_imgs, ref_cam, src_cams))

def timed(name, f, *a):
    r = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(3):
        r = jax.block_until_ready(f(*a))
    print(f"{name}: {(time.time()-t0)/3*1e3:.1f} ms")
    return r

timed("ncc_cost", jax.jit(ncc_cost), ctx, plane)
timed("select_candidates", jax.jit(lambda p, c, r: select_candidates(p, c, r)), plane, cost, ray)
cand, flags = select_candidates(plane, cost, ray)
timed("ncc_batch8", jax.jit(ncc_cost_batch), ctx, cand)
ca = ncc_cost_batch(ctx, cand)
timed("mhjvs", jax.jit(lambda k, c, f, s: mhjvs(k, c, f, s, 0)), key, ca, flags, sel)
timed("refinement_planes", jax.jit(lambda k: refinement_planes(k, n, d, sel, rx, ry, xs, ys, ref_cam, src_cams, 1.0, 8.0)), key)
timed("median", jax.jit(median_filter_depth), d, weak, cost)
timed("depth_to_weak", jax.jit(lambda: depth_to_weak(ctx, None, 0.2, n, d, sel, vw, xs, ys, ref_cam, src_cams, 1.0, 8.0, 6.0)))
timed("local_refine", jax.jit(lambda: local_refine(ctx, None, 0.2, n, d, sel, vw, xs, ys, ref_cam, src_cams, 1.0, 8.0)))
