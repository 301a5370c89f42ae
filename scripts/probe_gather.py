import time
import numpy as np
import jax, jax.numpy as jnp

H, W, A = 608, 800, 12
key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (H, W))
rng = np.random.default_rng(0)
# anchor-like indices: mostly local + some far
yy = np.clip(rng.integers(0, H, (A, H, W)), 0, H-1).astype(np.int32)
xx = np.clip(rng.integers(0, W, (A, H, W)), 0, W-1).astype(np.int32)
base_y = np.broadcast_to(np.arange(H)[None, :, None], (A, H, W))
off = rng.integers(-40, 40, (A, H, W))
yl = np.clip(base_y + off, 0, H-1).astype(np.int32)
idx_rand = jnp.asarray(yy * W + xx)
idx_loc = jnp.asarray(yl * W + xx)

def timeit(name, fn, *args, n=3):
    s = float(fn(*args))
    t0 = time.time()
    for _ in range(n):
        s = float(fn(*args))
    dt = (time.time()-t0)/n*1e3
    print(f"{name:34s} {dt:8.1f} ms  ({A*H*W/ (dt/1e3) /1e6:.0f}M/s)", flush=True)

flat = img.reshape(-1)
timeit("flat [A,H,W] random", jax.jit(lambda i: jnp.sum(flat[i])), idx_rand)
timeit("flat [A,H,W] local rows", jax.jit(lambda i: jnp.sum(flat[i])), idx_loc)
i32 = (img * 255).astype(jnp.int32)
timeit("int32 flat random", jax.jit(lambda i: jnp.sum(i32.reshape(-1)[i])), idx_rand)
timeit("jnp.take axis=None", jax.jit(lambda i: jnp.sum(jnp.take(flat, i))), idx_rand)
# vmap-of-1d variant
timeit("per-anchor loop", jax.jit(lambda i: jnp.sum(jnp.stack([flat[i[a]] for a in range(A)]))), idx_rand)
