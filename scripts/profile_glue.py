"""Time the strong half-iteration's XLA glue on TPU.

Half-iteration total (jitted _propagate_color_strong) minus the measured
fused-batch times = glue (selection, MHJVS, weighted costs, packing).
Also times mhjvs and select_candidates_edge standalone.
"""
import time
import numpy as np
import jax, jax.numpy as jnp

from dvpmvs.config import PMDynamic, PMStatic, PixelState, RunState
from dvpmvs.engine.packing import pack_ctx, pack_parity
from dvpmvs.engine.patchmatch import _grids, _propagate_color_strong, _ray
from dvpmvs.engine.state import PMState
from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import dist_to_origin
from dvpmvs.kernels.ncc import build_cost_context
from dvpmvs.kernels.propagation import mhjvs, select_candidates_edge
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
static = PMStatic(state=RunState.FIRST_INIT, num_src=V, max_iterations=3,
                  cost_backend="pallas")
edge = jnp.asarray(edge_segment(0, np.asarray(scene.images[0]), mode=0,
                                use_canny=True) > 0)
ed = jax.block_until_ready(edge_ray_distance(edge))

xs, ys = _grids(H, W)
rx = (xs - ref_cam.cx) / ref_cam.fx
ry = (ys - ref_cam.cy) / ref_cam.fy
ray = _ray(rx, ry)
parity = (xs.astype(jnp.int32) + ys.astype(jnp.int32)) % 2
n = jnp.asarray(scene.gt_normal[0]); d0 = jnp.asarray(scene.gt_depth[0])
w = dist_to_origin(n, xs, ys, d0, ref_cam)
plane = jnp.concatenate([n, w[..., None]], -1)

ctx = jax.block_until_ready(jax.jit(lambda ri, si: build_cost_context(
    ri, si, ref_cam, src_cams, 5.0, 3.0, backend="pallas"))(
        ref_img, src_imgs))
ctx_pks = (pack_ctx(ctx, 0), pack_ctx(ctx, 1))

state = PMState(plane=plane, cost=jnp.full((H, W), 0.4),
                sel_views=jnp.ones((H, W, V), bool),
                view_weights=jnp.ones((H, W, V)),
                weak=jnp.full((H, W), PixelState.STRONG, jnp.int8),
                radius=jnp.zeros((H, W)))


def timeit(name, fn, *args, n=3):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    dt_c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    print(f"{name:34s} {(time.time()-t0)/n*1e3:9.1f} ms  (compile {dt_c:4.0f}s)",
          flush=True)
    return out


half = jax.jit(lambda st: _propagate_color_strong(
    st, 0, 1, jax.random.PRNGKey(3), ctx, ctx_pks[0], ref_cam, src_cams,
    static, dyn, xs, ys, rx, ry, ray, parity, edge=edge, edge_dist=ed).plane)
timeit("strong half-iteration (edge)", half, state)

timeit("select_candidates_edge", jax.jit(
    lambda p, c: select_candidates_edge(p, c, edge, ed)[0]),
    state.plane, state.cost)

ca = jnp.zeros((16, H, 400, V))
flags = jnp.ones((16, H, 400), bool)
prior = jnp.ones((H, 400, V))
timeit("mhjvs (packed, 16 cand)", jax.jit(
    lambda c, f, p: mhjvs(jax.random.PRNGKey(0), c, f, p, 0)[0]),
    ca, flags, prior)
