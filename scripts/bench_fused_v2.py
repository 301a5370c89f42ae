"""Speed of the fused v2 kernel at bench scale (compiled, real backend)."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import dist_to_origin
from dvpmvs.kernels.ncc import build_cost_context
from dvpmvs.kernels.ncc_fused import fused_cost_from_ctx
from dvpmvs.engine.packing import pack_parity, pack_ctx
from dvpmvs.utils.synthetic import make_scene

H, W, V, B = (int(a) for a in sys.argv[1:5]) if len(sys.argv) > 4 else (608, 800, 10, 9)
scene = make_scene(num_views=5, height=H, width=W, seed=2)
ref = scene.cameras[0]
reps = [1 + i % 4 for i in range(V)]
src_cams = stack_cameras([scene.cameras[i] for i in reps])
src_imgs = jnp.asarray(scene.images[reps])

ctx = jax.block_until_ready(jax.jit(lambda ri, si: build_cost_context(
    ri, si, ref, src_cams, 5.0, 3.0, backend="pallas"))(
        jnp.asarray(scene.images[0]), src_imgs))
ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
n = jnp.asarray(scene.gt_normal[0]); d = jnp.asarray(scene.gt_depth[0])
w = dist_to_origin(n, xs, ys, d, ref)
plane = jnp.concatenate([n, w[..., None]], -1)
planes = jnp.stack([plane * (1 + 0.001 * i) for i in range(B)])


def timeit(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / n
    print(f"{name:34s} {dt*1e3:8.1f} ms  ({dt/B*1e3:.1f} ms/plane)",
          flush=True)
    return out


timeit(f"dense B={B}", jax.jit(lambda p: fused_cost_from_ctx(ctx, p)), planes)

ctx0 = pack_ctx(ctx, 0)
pk = jax.vmap(lambda p: pack_parity(p, 0))(planes)
timeit(f"packed B={B}", jax.jit(lambda p: fused_cost_from_ctx(
    ctx0, p, parity=0)), pk)

# view-masked (4 of 10 views active per tile)
Gi, Gj = -(-H // 8), -(-W // 128)
vm = jnp.full((Gi, Gj), 0b0000001111, jnp.int32)
timeit(f"dense masked 4/10 B={B}", jax.jit(lambda p: fused_cost_from_ctx(
    ctx, p, view_mask=vm)), planes)
timeit(f"packed masked 4/10 B={B}", jax.jit(lambda p: fused_cost_from_ctx(
    ctx0, p, parity=0, view_mask=vm)), pk)

# radius-map variant
rad = jnp.full((H, W), 7.5)
ctxr = jax.block_until_ready(jax.jit(lambda ri, si: build_cost_context(
    ri, si, ref, src_cams, 5.0, 3.0, backend="pallas", radius_map=rad))(
        jnp.asarray(scene.images[0]), src_imgs))
timeit(f"dense radius-map B={B}", jax.jit(
    lambda p: fused_cost_from_ctx(ctxr, p)), planes)
