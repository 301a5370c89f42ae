"""Checkerboard (red-black) packing helpers.

The red-black scheme updates one color per half-iteration
(Black/RedPixelUpdate*, APD.cu:3091-3165); a pixel of color ``c`` sits at
x = 2*i + (y + c) % 2.  Packing a [H, W] field to [H, ceil(W/2)] keeps only
the active color's pixels so candidate costs, MHJVS and refinement run on
half the data — the other half could not be written anyway.

All helpers are shape-polymorphic over trailing channel dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def packed_width(W: int) -> int:
    return (W + 1) // 2


def _row_parity(H: int, color: int, ndim_trailing: int) -> jnp.ndarray:
    par = (jnp.arange(H, dtype=jnp.int32) + color) % 2
    return par.reshape((H, 1) + (1,) * ndim_trailing)


def pack_parity(arr: jnp.ndarray, color: int) -> jnp.ndarray:
    """[H, W, ...] -> [H, ceil(W/2), ...]: keep pixels with
    (x + y + color) % 2 == 0, i.e. x = 2*i + (y + color) % 2."""
    H, W = arr.shape[0], arr.shape[1]
    if W % 2:
        pad = [(0, 0)] * arr.ndim
        pad[1] = (0, 1)
        arr = jnp.pad(arr, pad, mode="edge")
    a0 = arr[:, 0::2]
    a1 = arr[:, 1::2]
    par = _row_parity(H, color, arr.ndim - 2)
    return jnp.where(par == 0, a0, a1)


def unpack_parity(packed: jnp.ndarray, color: int, other: jnp.ndarray
                  ) -> jnp.ndarray:
    """Scatter a packed field back: active-color pixels take ``packed``,
    the rest keep ``other`` ([H, W, ...])."""
    H, W = other.shape[0], other.shape[1]
    expanded = jnp.repeat(packed, 2, axis=1)[:, :W]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    active = (xs + ys + color) % 2 == 0
    active = active.reshape((H, W) + (1,) * (other.ndim - 2))
    return jnp.where(active, expanded, other)


def pack_ctx(ctx, color: int):
    """CostContext view with per-pixel fields checkerboard-packed.

    Only the fields the fused kernel reads per evaluation pixel are packed;
    source quads stay full-resolution (gathers are full-res coordinates).
    """
    pk = lambda a: pack_parity(a, color)
    pk_t = lambda a: jax.vmap(pk)(a)           # leading [T] axis
    return ctx.replace(
        w_taps=pk_t(ctx.w_taps),
        wref_taps=pk_t(ctx.wref_taps),
        sum_w=pk(ctx.sum_w),
        sum_wref=pk(ctx.sum_wref),
        sum_wref2=pk(ctx.sum_wref2),
        radius=pk(ctx.radius),
    )
