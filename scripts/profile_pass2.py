"""Round-2 stage profile: edge-scan, packed batches, full pass iters split."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from dvpmvs.config import PMDynamic, PMStatic, RunState
from dvpmvs.engine import run_pass
from dvpmvs.engine.packing import pack_parity, pack_ctx
from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import dist_to_origin
from dvpmvs.kernels.ncc import build_cost_context, ncc_cost_batch
from dvpmvs.kernels.propagation import (select_candidates_edge,
                                        tile_plane_mask)
from dvpmvs.kernels.weak import edge_ray_distance
from dvpmvs.priors.edges import edge_segment
from dvpmvs.utils.synthetic import make_scene

H, W, V = 608, 800, 10
scene = make_scene(num_views=5, height=H, width=W, seed=2)
ref_cam = scene.cameras[0]
reps = [1 + i % 4 for i in range(V)]
src_cams = stack_cameras([scene.cameras[i] for i in reps])
src_imgs = jnp.asarray(scene.images[reps])
ref_img = jnp.asarray(scene.images[0])
dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min),
                       depth_max=float(ref_cam.depth_max))
edge = jnp.asarray(edge_segment(0, np.asarray(scene.images[0]), mode=0,
                                use_canny=True) > 0)
ed = edge_ray_distance(edge)

ys = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None], (H, W))
xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :], (H, W))
n = jnp.asarray(scene.gt_normal[0]); d0 = jnp.asarray(scene.gt_depth[0])
w = dist_to_origin(n, xs, ys, d0, ref_cam)
plane = jnp.concatenate([n, w[..., None]], -1)
cost = jnp.full((H, W), 0.4)

def timeit(name, fn, *args, n=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    print(f"{name:34s} {(time.time()-t0)/n*1e3:9.1f} ms", flush=True)
    return out

timeit("select_candidates_edge", jax.jit(
    lambda p, c: select_candidates_edge(p, c, edge, ed)), plane, cost)
timeit("edge_ray_distance", jax.jit(
    lambda e: edge_ray_distance(e)), edge)

ctx = jax.block_until_ready(jax.jit(lambda ri, si: build_cost_context(
    ri, si, ref_cam, src_cams, 5.0, 3.0, backend="pallas"))(
        ref_img, src_imgs))
ctx0 = pack_ctx(ctx, 0)
pk = lambda a: pack_parity(a, 0)
p17 = jnp.stack([pk(plane)] * 17)
always = jnp.ones((8,) + p17.shape[1:3], bool)
differs = jnp.zeros_like(always)
pm = tile_plane_mask(jnp.concatenate([always, differs, always[:1]]))
timeit("packed batch 17 pmask(8 dead)", jax.jit(
    lambda p: ncc_cost_batch(ctx0, p, parity=0, plane_mask=pm)), p17)
timeit("packed batch 9", jax.jit(
    lambda p: ncc_cost_batch(ctx0, p, parity=0)), p17[:9])

# full pass split
for iters in (1, 3):
    st = PMStatic(state=RunState.FIRST_INIT, num_src=V, max_iterations=iters,
                  cost_backend="pallas")
    fn = jax.jit(lambda ri, si, dd, kk, eg, st=st: run_pass(
        ri, si, ref_cam, src_cams, st, dd, kk, edge=eg))
    args = (ref_img, src_imgs, dyn, jax.random.PRNGKey(0), edge)
    out = jax.block_until_ready(fn(*args).depth)
    t0 = time.time()
    for _ in range(2):
        out = jax.block_until_ready(fn(*args).depth)
    print(f"full pass iters={iters}: {(time.time()-t0)/2*1e3:9.1f} ms",
          flush=True)
