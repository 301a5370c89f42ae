"""Tune fused-kernel knobs on TPU: pack_out x view_chunk matrix."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import itertools, sys, time
import numpy as np
import jax, jax.numpy as jnp

from dvpmvs.engine.packing import pack_ctx, pack_parity
from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import dist_to_origin
from dvpmvs.kernels.ncc import build_cost_context
from dvpmvs.kernels.ncc_fused import fused_cost_from_ctx
from dvpmvs.kernels.propagation import tile_view_mask
from dvpmvs.utils.synthetic import make_scene

H, W, V = 608, 800, 10
scene = make_scene(num_views=5, height=H, width=W, seed=2)
ref_cam = scene.cameras[0]
reps = [1 + i % 4 for i in range(V)]
src_cams = stack_cameras([scene.cameras[i] for i in reps])
src_imgs = jnp.asarray(scene.images[reps])
ref_img = jnp.asarray(scene.images[0])
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
p6 = p17[:6]
vw = jnp.ones((H, W, V)).at[..., 5:].set(0.0)
vm = tile_view_mask(pack_parity(vw, 0))


def timeit(name, fn, *args, n=5):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    dt_c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:38s} {(time.time()-t0)/n*1e3:9.1f} ms   "
          f"(compile {dt_c:5.1f} s)", flush=True)
    return out


for po, vc in itertools.product((True, False), (4, 5)):
    # sum the result to keep the unpack epilogue inside the jit but avoid
    # timing a host transfer of the full array
    timeit(f"17-plane pack_out={po} chunk={vc}", jax.jit(
        lambda p, po=po, vc=vc: fused_cost_from_ctx(
            ctx_pk, p, parity=0, pack_out=po, view_chunk=vc).sum()), p17)
for po, vc in itertools.product((True, False), (4, 5)):
    timeit(f"6-plane vmask pack_out={po} chunk={vc}", jax.jit(
        lambda p, m, po=po, vc=vc: fused_cost_from_ctx(
            ctx_pk, p, parity=0, view_mask=m, pack_out=po,
            view_chunk=vc).sum()), p6, vm)
