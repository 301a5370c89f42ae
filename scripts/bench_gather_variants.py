"""Microbenchmark: inner-gather strategies for the fused NCC kernel.

The round-2 roofline (BASELINE.md) says the kernel is VPU-bound at ~150
vector ops/tap, dominated by the DSPAN=8 roll+select+gather chain that
serves per-pixel source rows.  This script times isolated Pallas kernels
that run ONLY the gather machinery (36 taps x 170 plane-view equivalents
x tile grid) under different source layouts:

  quad8   — current production: 2x2-packed quads, 8-step row-select chain
  p2x5    — stride-2 vertical 4-row packing: ~5 row-word steps, but two
            lane gathers per step (x0 and x0+1 no longer co-packed)
  prim_*  — primitive op costs (roll, take_along_axis, repeat, select) to
            calibrate the op model

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gather_variants.py
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H, TILE_W = 8, 128
H, W = 608, 512            # source extent (column window cols=256 per block)
GRID = (38, 4)             # ~match bench tile count at packed half-res
TAPS = 36
PV = 17                    # plane-view pairs per tile (~17-plane batch, V
                           # amortized by view chunking; scaled to op parity)


def timeit(name, fn, *args, n=5):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    dt_c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:28s} {dt:9.2f} ms   (compile {dt_c:5.1f} s)", flush=True)
    return dt


def make_idx_fields(key):
    """Synthetic warp fields with realistic structure: y0 = s + delta with
    delta varying +-3 over the tile, x0 spanning a 256-col window."""
    k1, k2 = jax.random.split(key)
    y0 = jax.random.randint(k1, (TILE_H, TILE_W), 0, 6)      # dj in [0, 6)
    x0 = jax.random.randint(k2, (TILE_H, TILE_W), 0, 254)
    return y0.astype(jnp.int32), x0.astype(jnp.int32)


# ---------------------------------------------------------------- variants
def quad8_kernel(tap_ref, dj_ref, loc_ref, quads_ref, out_ref):
    dj0 = dj_ref[:]
    loc0 = loc_ref[:]
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    acc = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    def tap(t, acc):
        # per-tap offsets from SMEM (like taps_ref in the real kernel):
        # dynamic values CSE can't collapse across iterations
        dj = jnp.clip(dj0 + tap_ref[t, 0], 0, 7)
        loc = jnp.clip(loc0 + tap_ref[t, 1], 0, 255)
        a_base = tap_ref[t, 0] * 8
        up = tap_ref[t, 1] % 7 + 1
        g = jnp.zeros((TILE_H, TILE_W), jnp.int32)
        for xb in range(2):
            in_col = ((loc >= xb * TILE_W) & (loc < (xb + 1) * TILE_W))
            lloc = jnp.clip(loc - xb * TILE_W, 0, TILE_W - 1)
            blks = [quads_ref[pl.ds(a_base + u * TILE_H, TILE_H),
                              pl.ds(xb * TILE_W, TILE_W)]
                    for u in range(3)]
            rots = [pltpu.roll(bk, up, axis=0) for bk in blks]
            in_lo = s_iota < TILE_H - (up % 8)
            Rs = [jnp.where(in_lo, rots[u], rots[u + 1]) for u in range(2)]
            for j in range(8):
                r0 = Rs[j // TILE_H]
                jm = j % TILE_H
                if jm == 0:
                    win = r0
                else:
                    r1 = Rs[j // TILE_H + 1]
                    win = jnp.where(s_iota < TILE_H - jm,
                                    pltpu.roll(r0, TILE_H - jm, axis=0),
                                    pltpu.roll(r1, TILE_H - jm, axis=0))
                gg = jnp.take_along_axis(win, lloc, axis=1)
                g = jnp.where((dj == j) & in_col, gg, g)
        i00 = (g & 0xFF).astype(jnp.float32)
        i01 = ((g >> 8) & 0xFF).astype(jnp.float32)
        i10 = ((g >> 16) & 0xFF).astype(jnp.float32)
        i11 = ((g >> 24) & 0xFF).astype(jnp.float32)
        return acc + (i00 * 0.3 + i01 * 0.2 + i10 * 0.25 + i11 * 0.25)

    def pv_body(p, acc):
        return jax.lax.fori_loop(0, TAPS, tap, acc)

    out_ref[:] = jax.lax.fori_loop(0, PV, pv_body, acc)


def p2x5_kernel(tap_ref, dj_ref, loc_ref, p2_ref, out_ref):
    """Stride-2 4-row words: rows span in word space ~ceil(6/2)+1 = 4-5
    steps; two take_along_axis per step (x0, x0+1); byte offset b0 = y&1
    resolved by a variable shift at the end."""
    dj0 = dj_ref[:]
    loc0 = loc_ref[:]
    acc = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    def tap(t, acc):
        dj = jnp.clip(dj0 + tap_ref[t, 0], 0, 7)
        loc = jnp.clip(loc0 + tap_ref[t, 1], 0, 255)
        a_base = tap_ref[t, 0] * 8
        m0 = tap_ref[t, 1] % 3
        b0 = (dj & 1).astype(jnp.int32)
        djw = dj >> 1
        gA = jnp.zeros((TILE_H, TILE_W), jnp.int32)
        gB = jnp.zeros((TILE_H, TILE_W), jnp.int32)
        locB = jnp.minimum(loc + 1, 255)
        for xb in range(2):
            in_col = ((loc >= xb * TILE_W) & (loc < (xb + 1) * TILE_W))
            in_colB = ((locB >= xb * TILE_W) & (locB < (xb + 1) * TILE_W))
            lloc = jnp.clip(loc - xb * TILE_W, 0, TILE_W - 1)
            llocB = jnp.clip(locB - xb * TILE_W, 0, TILE_W - 1)
            # one aligned 8-row block covers 16 original rows; stretch it
            blk = p2_ref[pl.ds(a_base, TILE_H), pl.ds(xb * TILE_W, TILE_W)]
            stretch = pltpu.repeat(blk, 2, axis=0)   # [16,128] str[s]=blk[s>>1]
            for j in range(4):
                win = pltpu.roll(stretch, (16 - 2 * j) % 16, axis=0)[:TILE_H]
                ggA = jnp.take_along_axis(win, lloc, axis=1)
                ggB = jnp.take_along_axis(win, llocB, axis=1)
                sel = (djw == j + m0 - 1)
                gA = jnp.where(sel & in_col, ggA, gA)
                gB = jnp.where(sel & in_colB, ggB, gB)
        sh = b0 << 3
        wA = jax.lax.shift_right_logical(gA, sh)
        wB = jax.lax.shift_right_logical(gB, sh)
        i00 = (wA & 0xFF).astype(jnp.float32)
        i10 = ((wA >> 8) & 0xFF).astype(jnp.float32)
        i01 = (wB & 0xFF).astype(jnp.float32)
        i11 = ((wB >> 8) & 0xFF).astype(jnp.float32)
        return acc + (i00 * 0.3 + i01 * 0.2 + i10 * 0.25 + i11 * 0.25)

    def pv_body(p, acc):
        return jax.lax.fori_loop(0, TAPS, tap, acc)

    out_ref[:] = jax.lax.fori_loop(0, PV, pv_body, acc)


def prim_kernel_factory(op, n_inner=8):
    def kern(tap_ref, dj_ref, loc_ref, quads_ref, out_ref):
        loc0 = loc_ref[:]
        acc = jnp.zeros((TILE_H, TILE_W), jnp.int32)

        def tap(t, acc):
            loc = jnp.clip(loc0 + tap_ref[t, 1], 0, TILE_W - 1)
            blk = quads_ref[pl.ds(tap_ref[t, 0] * 8, TILE_H),
                            pl.ds(0, TILE_W)]
            for j in range(n_inner):
                if op == "roll":
                    blk = pltpu.roll(blk, 1 + (j % 7), axis=0)
                    acc = acc + blk
                elif op == "gather":
                    acc = acc + jnp.take_along_axis(blk, loc + j, axis=1)
                elif op == "select":
                    acc = jnp.where((loc & 7) == j, blk, acc)
                elif op == "repeat":
                    acc = acc + pltpu.repeat(blk, 2, axis=0)[
                        (j % 2) * TILE_H:(j % 2 + 1) * TILE_H]
                elif op == "vshift":
                    acc = acc + jax.lax.shift_right_logical(
                        blk, ((loc + j) & 3) << 3)
            return acc

        def pv_body(p, acc):
            return jax.lax.fori_loop(0, TAPS, tap, acc)

        out_ref[:] = jax.lax.fori_loop(0, PV, pv_body, acc).astype(
            jnp.float32)
    return kern


def make_inputs():
    dj, loc = make_idx_fields(jax.random.PRNGKey(0))
    djs = jnp.tile(dj[None, None], (GRID[0], GRID[1], 1, 1)).reshape(
        GRID[0] * TILE_H, GRID[1] * TILE_W)
    locs = jnp.tile(loc[None, None], (GRID[0], GRID[1], 1, 1)).reshape(
        GRID[0] * TILE_H, GRID[1] * TILE_W)
    quads = jax.random.randint(jax.random.PRNGKey(1), (64, 256),
                               jnp.iinfo(jnp.int32).min,
                               jnp.iinfo(jnp.int32).max, jnp.int32)
    taps = jax.random.randint(jax.random.PRNGKey(2), (TAPS, 2), 0, 4,
                              jnp.int32)
    return taps, djs, locs, quads


def run(kern, taps, djs, locs, quads):
    spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=GRID,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(
            (GRID[0] * TILE_H, GRID[1] * TILE_W), jnp.float32),
    )(taps, djs, locs, quads)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    ins = jax.block_until_ready(make_inputs())
    t_quad = timeit("quad8 (production loop)",
                    jax.jit(partial(run, quad8_kernel)), *ins)
    t_p2 = timeit("p2x5 (stride-2 words)",
                  jax.jit(partial(run, p2x5_kernel)), *ins)
    for op in ("roll", "gather", "select", "repeat", "vshift"):
        timeit(f"prim {op} x8",
               jax.jit(partial(run, prim_kernel_factory(op))), *ins)
    print(f"\nquad8 {t_quad:.1f} ms vs p2x5 {t_p2:.1f} ms "
          f"({t_quad / max(t_p2, 1e-9):.2f}x)")
