import sys, time
import jax, jax.numpy as jnp
impl = sys.argv[1] if len(sys.argv) > 1 else "threefry2x32"
jax.config.update("jax_default_prng_impl", impl)
key = jax.random.PRNGKey(0)

def timeit(name, fn, *args, n=5):
    s = float(fn(*args))          # warm compile + force
    t0 = time.time()
    for _ in range(n):
        s = float(fn(*args))      # scalar fetch forces full execution
    print(f"[{impl}] {name:30s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)

timeit("uniform 62M", jax.jit(lambda k: jnp.sum(jax.random.uniform(k, (128, 608, 800)))), key)
timeit("uniform 4M", jax.jit(lambda k: jnp.sum(jax.random.uniform(k, (8, 608, 800)))), key)
timeit("add 62M", jax.jit(lambda k: jnp.sum(jnp.zeros((128, 608, 800)) + 1.0)), key)
timeit("noop scalar", jax.jit(lambda k: jnp.float32(1.0)), key)
from dvpmvs.geometry.transforms import random_unit_normals
timeit("unit_normals 8xHW", jax.jit(lambda k: jnp.sum(random_unit_normals(k, (8, 608, 800)))), key)
from dvpmvs.kernels.refine import refinement_planes
from dvpmvs.geometry import stack_cameras
from dvpmvs.utils.synthetic import make_scene
H, W, V = 608, 800, 10
scene = make_scene(num_views=5, height=H, width=W, seed=2)
ref_cam = scene.cameras[0]
src_cams = stack_cameras([scene.cameras[i] for i in [1+i%4 for i in range(V)]])
ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
rx = (xs - ref_cam.cx)/ref_cam.fx; ry = (ys - ref_cam.cy)/ref_cam.fy
n = jnp.asarray(scene.gt_normal[0]); d0 = jnp.asarray(scene.gt_depth[0])
sel = jnp.ones((H, W, V), bool)
timeit("refinement_planes", jax.jit(lambda k: jnp.sum(refinement_planes(
    k, n, d0, sel, rx, ry, xs, ys, ref_cam, src_cams, 1.0, 8.0))), key)
