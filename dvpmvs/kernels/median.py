"""Checkerboard median depth filter.

Oracle: ``CheckerboardFilterStrong`` (APD.cu:3184-3328): a 21-tap median over
the center, cross arms at ±1/±3/±5 and eight knight-ish taps, restricted to
STRONG neighbors, applied to non-WEAK pixels unless their cost is < 0.001.
Black then red half-iterations (red sees black-filtered depths).

TPU form: each tap is a static shift; the masked median of a fixed-size
stack is a sort + index by valid count — dense VPU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import PixelState
from .propagation import shift_map, _in_bounds_mask

# (dx, dy) taps, center first (APD.cu:3199-3290)
_TAPS = [(0, 0),
         (0, -1), (0, -3), (0, -5), (0, 1), (0, 3), (0, 5),
         (-1, 0), (-3, 0), (-5, 0), (1, 0), (3, 0), (5, 0),
         (2, -1), (2, 1), (-2, -1), (-2, 1),
         (-1, -2), (1, -2), (-1, 2), (1, 2)]


def _masked_median(vals: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """vals [T, H, W], valid [T, H, W] -> median over valid entries [H, W]."""
    big = jnp.where(valid, vals, jnp.inf)
    srt = jnp.sort(big, axis=0)
    n = jnp.sum(valid, axis=0)
    T = vals.shape[0]
    mid = n // 2
    lo = jnp.clip(mid - 1, 0, T - 1)
    hi = jnp.clip(mid, 0, T - 1)
    from .gatherfree import take0
    v_hi = take0(srt, hi)
    v_lo = take0(srt, lo)
    even = (n % 2) == 0
    return jnp.where(even, 0.5 * (v_lo + v_hi), v_hi)


def median_filter_depth(depth: jnp.ndarray, weak: jnp.ndarray,
                        cost: jnp.ndarray) -> jnp.ndarray:
    """Two-color checkerboard 21-tap median of the depth map."""
    H, W = depth.shape
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    parity = (xs + ys) % 2
    strong = weak == PixelState.STRONG
    eligible = (weak != PixelState.WEAK) & (cost >= 0.001)

    for color in (0, 1):
        vals = []
        valid = []
        for (dx, dy) in _TAPS:
            inb = _in_bounds_mask(H, W, dx, dy)
            vals.append(shift_map(depth, dx, dy))
            if dx == 0 and dy == 0:
                valid.append(jnp.ones((H, W), bool))
            else:
                valid.append(inb & shift_map(strong, dx, dy))
        med = _masked_median(jnp.stack(vals), jnp.stack(valid))
        update = eligible & (parity == color)
        depth = jnp.where(update, med, depth)
    return depth
