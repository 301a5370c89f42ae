"""Minimal TPU profile: init+post pass, packed NCC batches, sweep kernel.

Four compiles only; prints per-item times unbuffered.  Bench gives the
full 3-iter pass time; iters=0 isolates init+post, and the batch timings
attribute the iteration loop.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from dvpmvs.config import PMDynamic, PMStatic, RunState
from dvpmvs.engine import run_pass
from dvpmvs.engine.packing import pack_ctx, pack_parity
from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import dist_to_origin
from dvpmvs.kernels.ncc import build_cost_context, ncc_cost_batch
from dvpmvs.kernels.propagation import tile_view_mask
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
key = jax.random.PRNGKey(0)


def timeit(name, fn, *args, n=3):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    print(f"{name:30s} compile+run {time.time()-t0:7.1f} s", flush=True)
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    print(f"{name:30s} {(time.time()-t0)/n*1e3:9.1f} ms", flush=True)
    return out


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "pass0"):
    static0 = PMStatic(state=RunState.FIRST_INIT, num_src=V,
                       max_iterations=0, cost_backend="pallas")
    fn0 = jax.jit(lambda ri, si, dd, kk, eg: run_pass(
        ri, si, ref_cam, src_cams, static0, dd, kk, edge=eg))
    timeit("pass iters=0 (init+post)", lambda: fn0(
        ref_img, src_imgs, dyn, key, edge).depth)

if which in ("all", "batch"):
    ctx = jax.block_until_ready(jax.jit(lambda ri, si: build_cost_context(
        ri, si, ref_cam, src_cams, 5.0, 3.0, backend="pallas"))(
            ref_img, src_imgs))
    ctx_pk = pack_ctx(ctx, 0)
    ys = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None], (H, W))
    xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :], (H, W))
    n = jnp.asarray(scene.gt_normal[0]); d0 = jnp.asarray(scene.gt_depth[0])
    w = dist_to_origin(n, xs, ys, d0, ref_cam)
    plane = jnp.concatenate([n, w[..., None]], -1)
    plane_pk = pack_parity(plane, 0)

    p17 = jnp.tile(plane_pk[None], (17, 1, 1, 1))
    timeit("packed 17-plane batch", jax.jit(
        lambda p: ncc_cost_batch(ctx_pk, p, parity=0)), p17)

    p6 = p17[:6]
    vw = jnp.ones((H, W, V)).at[..., 5:].set(0.0)
    vm = tile_view_mask(pack_parity(vw, 0))
    timeit("packed 6-plane batch vmask", jax.jit(
        lambda p, m: ncc_cost_batch(ctx_pk, p, parity=0, view_mask=m)),
        p6, vm)
