"""Microbenchmark Mosaic primitive costs: lane gather vs rolls vs selects."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 512, 1024
N = 512   # ops per tile per grid step
grid = (H // 8, W // 128)


def run(name, kernel):
    f = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[pl.BlockSpec((8, 128), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
    )
    x = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) % 97
    idx = (jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) * 7) % 128
    g = jax.jit(lambda a, b: f(a, b))
    out = jax.block_until_ready(g(x, idx))
    t0 = time.time()
    R = 100
    for _ in range(R):
        out = jax.block_until_ready(g(x, idx))
    dt = (time.time() - t0) / R
    ntiles = grid[0] * grid[1]
    print(f"{name:24s} {dt*1e6:8.1f} us total, "
          f"{dt/ntiles/N*1e9:7.2f} ns/op/tile", flush=True)


def k_take(x_ref, i_ref, o_ref):
    x = x_ref[:]
    idx = i_ref[:]
    acc = jnp.zeros((8, 128), jnp.int32)
    for t in range(N):
        acc += jnp.take_along_axis(x, (idx + t) % 128, axis=1)
    o_ref[:] = acc


def k_roll_static(x_ref, i_ref, o_ref):
    x = x_ref[:]
    acc = jnp.zeros((8, 128), jnp.int32)
    for t in range(N):
        acc += pltpu.roll(x, (t * 7) % 128, axis=1)
    o_ref[:] = acc


def k_roll_static_sub(x_ref, i_ref, o_ref):
    x = x_ref[:]
    acc = jnp.zeros((8, 128), jnp.int32)
    for t in range(N):
        acc += pltpu.roll(x, t % 8, axis=0)
    o_ref[:] = acc


def k_roll_dyn(x_ref, i_ref, o_ref):
    x = x_ref[:]
    s = i_ref[0, 0]
    acc = jnp.zeros((8, 128), jnp.int32)
    for t in range(N):
        acc += pltpu.roll(x, (s + t) % 128, axis=1)
    o_ref[:] = acc


def k_roll_dyn_sub(x_ref, i_ref, o_ref):
    x = x_ref[:]
    s = i_ref[0, 0]
    acc = jnp.zeros((8, 128), jnp.int32)
    for t in range(N):
        acc += pltpu.roll(x, (s + t) % 8, axis=0)
    o_ref[:] = acc


def k_select(x_ref, i_ref, o_ref):
    x = x_ref[:]
    idx = i_ref[:]
    acc = jnp.zeros((8, 128), jnp.int32)
    for t in range(N):
        acc = jnp.where(idx == t, x, acc)
    o_ref[:] = acc


def k_fma(x_ref, i_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    acc = jnp.zeros((8, 128), jnp.float32)
    for t in range(N):
        acc = acc * 1.0001 + x
    o_ref[:] = acc.astype(jnp.int32)


def k_dynslice(x_ref, i_ref, o_ref):
    # dynamic VMEM loads: 8-row slices at data-dependent offsets
    s = i_ref[0, 0] % 8
    acc = jnp.zeros((8, 128), jnp.int32)
    for t in range(N):
        acc += x_ref[pl.ds(((s + t) % 8) * 0, 8), :]
    o_ref[:] = acc


run("take_along lane", k_take)
run("roll static lane", k_roll_static)
run("roll static sublane", k_roll_static_sub)
run("roll dynamic lane", k_roll_dyn)
run("roll dynamic sublane", k_roll_dyn_sub)
run("select", k_select)
run("fma", k_fma)
run("dyn slice load", k_dynslice)
