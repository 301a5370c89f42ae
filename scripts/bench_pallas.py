import sys, time, numpy as np, jax, jax.numpy as jnp
from dvpmvs.utils.synthetic import make_scene
from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import dist_to_origin
from dvpmvs.kernels.ncc import build_cost_context, ncc_cost

H, W, V = (int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3 else (608, 800, 10)
scene = make_scene(num_views=3, height=H, width=W, seed=4)
ref = scene.cameras[0]
src_cams = stack_cameras([scene.cameras[1]] * V)
src_imgs = jnp.tile(jnp.asarray(scene.images[1])[None], (V, 1, 1))
mk = jax.jit(lambda ri, si: build_cost_context(ri, si, ref, src_cams, 5.0, 3.0, backend="pallas"))
ctx = jax.block_until_ready(mk(jnp.asarray(scene.images[0]), src_imgs))
ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing='ij')
n = jnp.asarray(scene.gt_normal[0]); d = jnp.asarray(scene.gt_depth[0])
w = dist_to_origin(n, xs, ys, d, ref)
plane = jnp.concatenate([n, w[..., None]], -1)

@jax.jit
def chain(ctx, p, steps):
    def body(i, pp):
        c = ncc_cost(ctx, pp)
        return pp * (1.0 + 1e-7 * jnp.mean(c))
    return jax.lax.fori_loop(0, steps, body, p)

print('compiling...', flush=True)
t0 = time.time()
r = jax.block_until_ready(chain(ctx, plane, 2))
print(f'compile+2 runs: {time.time()-t0:.1f}s', flush=True)
t0 = time.time()
N = 50
r = jax.block_until_ready(chain(ctx, plane, N))
dt = (time.time() - t0) / N
print(f'pallas ncc_cost {H}x{W} V={V}: {dt*1e3:.2f} ms/eval '
      f'({H*W*V*36/dt/1e9:.2f} G samples/s)', flush=True)

# correctness spot check vs exact on TPU
ctx_e = jax.block_until_ready(jax.jit(lambda ri, si: build_cost_context(ri, si, ref, src_cams, 5.0, 3.0, backend="exact"))(jnp.asarray(scene.images[0]), src_imgs))
ce = np.asarray(jax.block_until_ready(jax.jit(ncc_cost)(ctx_e, plane)))
cp = np.asarray(jax.block_until_ready(jax.jit(ncc_cost)(ctx, plane)))
diff = np.abs(ce - cp)
print('vs exact: median', np.median(diff), 'p99', np.percentile(diff, 99), 'max', diff.max())
