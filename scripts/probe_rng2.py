import time
import jax, jax.numpy as jnp
key = jax.random.PRNGKey(0)
S, H, W = 8, 608, 800

def timeit(name, fn, *args, n=5):
    s = float(fn(*args))
    t0 = time.time()
    for _ in range(n):
        s = float(fn(*args))
    print(f"{name:36s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)

def sph_minor(k):
    kz, kp = jax.random.split(k)
    z = jax.random.uniform(kz, (S, H, W), minval=-1.0, maxval=1.0)
    phi = jax.random.uniform(kp, (S, H, W), minval=0.0, maxval=2*jnp.pi)
    r = jnp.sqrt(jnp.maximum(1.0 - z*z, 0.0))
    return jnp.stack([r*jnp.cos(phi), r*jnp.sin(phi), z], axis=-1)

def sph_major(k):
    kz, kp = jax.random.split(k)
    z = jax.random.uniform(kz, (S, H, W), minval=-1.0, maxval=1.0)
    phi = jax.random.uniform(kp, (S, H, W), minval=0.0, maxval=2*jnp.pi)
    r = jnp.sqrt(jnp.maximum(1.0 - z*z, 0.0))
    return jnp.stack([r*jnp.cos(phi), r*jnp.sin(phi), z], axis=0)

def marsaglia_pieces(k):
    q = jax.random.uniform(k, (2, 8, S, H, W), minval=-1.0, maxval=1.0)
    s = q[0]*q[0] + q[1]*q[1]
    return jnp.sum(s)

def marsaglia_argmax(k):
    q = jax.random.uniform(k, (2, 8, S, H, W), minval=-1.0, maxval=1.0)
    s = q[0]*q[0] + q[1]*q[1]
    idx = jnp.argmax(s < 1.0, axis=0)[None]
    return jnp.sum(idx)

def marsaglia_take(k):
    q = jax.random.uniform(k, (2, 8, S, H, W), minval=-1.0, maxval=1.0)
    s = q[0]*q[0] + q[1]*q[1]
    idx = jnp.argmax(s < 1.0, axis=0)[None]
    q1 = jnp.take_along_axis(q[0], idx, axis=0)[0]
    q2 = jnp.take_along_axis(q[1], idx, axis=0)[0]
    return jnp.sum(q1) + jnp.sum(q2)

timeit("spherical -> [...,3]", jax.jit(lambda k: jnp.sum(sph_minor(k))), key)
timeit("spherical -> [3,...]", jax.jit(lambda k: jnp.sum(sph_major(k))), key)
timeit("marsaglia draw+s", jax.jit(marsaglia_pieces), key)
timeit("marsaglia +argmax", jax.jit(marsaglia_argmax), key)
timeit("marsaglia +take", jax.jit(marsaglia_take), key)
