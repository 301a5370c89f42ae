import sys, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
which = sys.argv[1]

if which == 'A':
    H, W = 8, 512
    img = jax.random.uniform(jax.random.PRNGKey(0), (H, W))
    idx = jax.random.randint(jax.random.PRNGKey(1), (H, W), 0, H, jnp.int32)
    def k(a, i, o):
        o[:] = jnp.take_along_axis(a[:], i[:], axis=0)
    f = jax.jit(lambda a,i: pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((H,W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2, out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a,i))
    r = jax.block_until_ready(f(img, idx))
    print('A ok:', np.allclose(np.asarray(r), np.take_along_axis(np.asarray(img), np.asarray(idx), 0)), flush=True)
elif which == 'C':
    def k(a, s_ref, o):
        y0 = s_ref[0]
        o[:] = a[pl.ds(y0, 8), :]
    f = jax.jit(lambda a, s: pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, s))
    big = jax.random.uniform(jax.random.PRNGKey(3), (64, 128))
    r = jax.block_until_ready(f(big, jnp.array([13], jnp.int32)))
    print('C ok (unaligned 13):', np.allclose(np.asarray(r), np.asarray(big)[13:21]), flush=True)
elif which == 'D':
    def k(a, o):
        v = a[:]
        o[:] = ((v >> 8) & 0xFF).astype(jnp.float32)
    ai = jax.random.randint(jax.random.PRNGKey(4), (8,128), 0, 2**30, jnp.int32)
    f = jax.jit(lambda a: pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)], out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a))
    r = jax.block_until_ready(f(ai))
    print('D ok:', np.allclose(np.asarray(r), ((np.asarray(ai)>>8)&0xFF).astype(np.float32)), flush=True)
elif which == 'E':
    # lane gather within one [8,128] vreg, output [8,128]
    H, W = 8, 128
    img = jax.random.uniform(jax.random.PRNGKey(0), (H, W))
    idx = jax.random.randint(jax.random.PRNGKey(1), (H, W), 0, W, jnp.int32)
    def k(a, i, o):
        o[:] = jnp.take_along_axis(a[:], i[:], axis=1)
    f = jax.jit(lambda a,i: pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((H,W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2, out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a,i))
    r = jax.block_until_ready(f(img, idx))
    print('E ok:', np.allclose(np.asarray(r), np.take_along_axis(np.asarray(img), np.asarray(idx), 1)), flush=True)
