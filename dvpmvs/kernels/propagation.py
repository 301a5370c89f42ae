"""Adaptive checkerboard propagation: candidate pre-selection and
multi-hypothesis joint view selection (MHJVS).

Oracle: ``CheckerboardPropagationStrong`` non-edge branch (APD.cu:2142-2560,
ACMM-style).  Eight directional candidate groups — four "far" rays and four
V-shaped diagonal sweeps — are pre-filtered by the *current cost map* (cheap)
with a normal-facing test, then only the 8 surviving candidate planes get a
full NCC evaluation.  The CUDA kernel walks these serially per thread; here
every group member is a static image shift, so the pre-selection is a handful
of masked elementwise min-scans over shifted maps — no gathers at all.

The extended far propagation (APD.cu:1385-1895, up to 3 rounds reaching ~45px)
keeps the same static-offset structure with larger bases; rounds are gated by
``JudgeExtend`` per pixel.

Deviations from the reference (SURVEY §2.5-class quirks, intentionally fixed):
  * invalid directions enter MHJVS with cost 2.0, not the 0.0 the C++
    aggregate-initializer accidentally produces for cost_array[i>0];
  * the adopted candidate is the group's pre-selected plane (the reference
    indexes an uninitialized ``positions[]`` in this branch — UB).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .ncc import COST_MAX

# Candidate offsets (dx, dy) per direction group, first entry = base.
# Derived from APD.cu:2146-2460: far rays sample at 5,7,9,11,13; diagonal
# V-sweeps alternate steps of 2 starting at (±5, ±6)/(±6, ±5).
def _vsweep(x0: int, y0: int, first_axis: str, sx: int, sy: int) -> List[Tuple[int, int]]:
    out = [(x0, y0)]
    x, y = x0, y0
    for i in range(7):
        if (i % 2 == 0) == (first_axis == "x"):
            x += 2 * sx
        else:
            y += 2 * sy
        out.append((x, y))
    return out


DIRECTIONS: List[List[Tuple[int, int]]] = [
    _vsweep(-5, -6, "x", -1, -1),                       # 0 left_up
    [(0, -5), (0, -7), (0, -9), (0, -11), (0, -13)],    # 1 up_far
    _vsweep(6, -5, "y", 1, -1),                         # 2 right_up
    [(0, 5), (0, 7), (0, 9), (0, 11), (0, 13)],         # 3 down_far
    _vsweep(5, 6, "x", 1, 1),                           # 4 right_down
    [(-5, 0), (-7, 0), (-9, 0), (-11, 0), (-13, 0)],    # 5 left_far
    _vsweep(-6, 5, "y", -1, 1),                         # 6 left_down
    [(5, 0), (7, 0), (9, 0), (11, 0), (13, 0)],         # 7 right_far
]

# Which direction flag gates the view-selection prior of each direct
# neighbor [up, down, left, right] (APD.cu:2468-2480: flag[2i]).
PRIOR_FLAG_INDEX = (0, 2, 4, 6)
PRIOR_NEIGHBOR_OFFSETS = ((0, -1), (0, 1), (-1, 0), (1, 0))


def shift_map(arr: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """out[y, x] = arr[y + dy, x + dx] (wrapping; mask with in_bounds)."""
    return jnp.roll(arr, shift=(-dy, -dx), axis=(0, 1))


def _in_bounds_mask(H: int, W: int, dx: int, dy: int) -> jnp.ndarray:
    """Traced (iota-based) in-bounds mask.

    Deliberately NOT a numpy constant: large constants embedded in compiled
    programs are re-streamed to the device on every execution under tunneled
    TPU runtimes — iota is generated on-device for free.
    """
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    return ((xs + dx >= 0) & (xs + dx < W) & (ys + dy >= 0) & (ys + dy < H))


def select_candidates(
    plane: jnp.ndarray,        # [H, W, 4]
    cost: jnp.ndarray,         # [H, W]
    ray: jnp.ndarray,          # [H, W, 3] normalized per-pixel ref ray
    strong_ok: jnp.ndarray | None = None,   # [H, W] propagation sources mask
    extend_round: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pre-select the best candidate plane per direction by cost-map scan.

    Returns (cand_planes [8, H, W, 4], flags [8, H, W]).  ``strong_ok``
    restricts propagation *sources* (the weak pass only accepts anchors that
    are STRONG; the strong pass accepts any pixel, as the reference does).
    ``extend_round`` >= 0 shifts the far-ray bases by 10*(round+1) px
    (extended propagation).
    """
    H, W = cost.shape
    cand_planes = []
    flags = []
    for d, offsets in enumerate(DIRECTIONS):
        if extend_round >= 0:
            if len(offsets) != 5:
                # diagonal groups extend along both axes (reference uses the
                # same +10px push on its V-sweeps' bases)
                push = 10 * (extend_round + 1)
                offsets = [(x + int(np.sign(x)) * push, y + int(np.sign(y)) * push)
                           for (x, y) in offsets]
            else:
                push = 10 * (extend_round + 1)
                offsets = [(x + int(np.sign(x)) * push, y + int(np.sign(y)) * push)
                           for (x, y) in offsets]
        bx, by = offsets[0]
        base_ok = _in_bounds_mask(H, W, bx, by)
        if strong_ok is not None:
            base_ok = base_ok & shift_map(strong_ok, bx, by)
        best_cost = jnp.where(base_ok, shift_map(cost, bx, by), jnp.inf)
        best_plane = shift_map(plane, bx, by)
        for (ox, oy) in offsets[1:]:
            ok = _in_bounds_mask(H, W, ox, oy)
            if strong_ok is not None:
                ok = ok & shift_map(strong_ok, ox, oy)
            c = shift_map(cost, ox, oy)
            pl = shift_map(plane, ox, oy)
            facing = jnp.sum(pl[..., :3] * ray, axis=-1) <= 0.0
            better = ok & facing & (c < best_cost)
            best_cost = jnp.where(better, c, best_cost)
            best_plane = jnp.where(better[..., None], pl, best_plane)
        cand_planes.append(best_plane)
        flags.append(base_ok)
    return jnp.stack(cand_planes), jnp.stack(flags)


def judge_extend(iter_idx: jnp.ndarray, ext_round: int,
                 cost_array: jnp.ndarray, flags: jnp.ndarray) -> jnp.ndarray:
    """Per-(dir, pixel) gate for extended propagation (APD.cu JudgeExtend):
    needs >=1 view below 0.8*exp(-iter^2 (3-ext)/90) and <=2 views above 1.2.

    cost_array [8, H, W, V], flags [8, H, W] -> bool [8, H, W].
    """
    it = jnp.asarray(iter_idx, jnp.float32)
    good_thr = 0.8 * jnp.exp(it * it * (3.0 - ext_round) / -90.0)
    good = jnp.sum(cost_array < good_thr, axis=-1)
    bad = jnp.sum(cost_array > 1.2, axis=-1)
    return flags & (good >= 1) & (bad <= 2)


def neighbor_prior(sel_views: jnp.ndarray, flags: jnp.ndarray) -> jnp.ndarray:
    """Strong-pass view-selection prior from the 4 direct neighbors'
    selected-view sets, gated by flag[2i] (APD.cu:2468-2480)."""
    H, W, V = sel_views.shape
    prior = jnp.zeros((H, W, V), jnp.float32)
    for (ox, oy), fidx in zip(PRIOR_NEIGHBOR_OFFSETS, PRIOR_FLAG_INDEX):
        nb = shift_map(sel_views.astype(jnp.float32), ox, oy)
        gate = flags[fidx][..., None].astype(jnp.float32)
        prior = prior + gate * jnp.where(nb > 0, 0.9, 0.1)
    return prior


def mhjvs(
    key: jax.Array,
    cost_array: jnp.ndarray,    # [8, H, W, V] candidate NCC cost vectors
    flags: jnp.ndarray,         # [8, H, W]
    prior: jnp.ndarray,         # [H, W, V] view-selection prior
    iter_idx,
    num_samples: int = 15,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Multi-hypothesis joint view selection (APD.cu:2462-2541).

    Returns (view_weights [H, W, V] float counts, temp_selected [H, W, V]
    bool, weight_norm [H, W]).
    """
    D, H, W, V = cost_array.shape

    # masked candidate costs: invalid directions act as cost_max
    ca = jnp.where(flags[..., None], cost_array, COST_MAX)

    it = jnp.asarray(iter_idx, jnp.float32)
    cost_threshold = 0.8 * jnp.exp(it * it / -90.0)
    below = ca < cost_threshold                       # [8, H, W, V]
    count = jnp.sum(below, axis=0).astype(jnp.float32)
    count_false = jnp.sum(ca > 1.2, axis=0)
    tmpw = jnp.sum(jnp.where(below, jnp.exp(ca * ca / -0.18), 0.0), axis=0)

    probs = jnp.where(
        (count > 2) & (count_false < 3), tmpw / jnp.maximum(count, 1.0),
        jnp.where(count_false < 3,
                  jnp.exp(cost_threshold * cost_threshold / -0.32), 0.0))
    probs = probs * prior                             # [H, W, V]

    # normalized CDF + multinomial draws -> integer view weights
    total = jnp.sum(probs, axis=-1, keepdims=True)
    cdf = jnp.cumsum(probs, axis=-1) / jnp.maximum(total, 1e-30)
    cdf = jnp.where(total > 0, cdf, 0.0)              # all-zero rows never hit
    r = jax.random.uniform(key, (num_samples, H, W, 1))
    # first v with cdf[v] > r  <=>  count of cdf <= r
    idx = jnp.sum(cdf[None] <= r, axis=-1)            # [S, H, W]
    view_weights = jnp.sum(
        jax.nn.one_hot(idx, V, dtype=jnp.float32), axis=0)  # [H, W, V]

    temp_selected = view_weights > 0
    weight_norm = jnp.sum(view_weights, axis=-1)
    return view_weights, temp_selected, weight_norm


def weighted_cost(cost_vec: jnp.ndarray, view_weights: jnp.ndarray,
                  weight_norm: jnp.ndarray) -> jnp.ndarray:
    """Combine per-view costs with MC view weights -> [.., H, W]."""
    num = jnp.sum(cost_vec * view_weights, axis=-1)
    return jnp.where(weight_norm > 0, num / jnp.maximum(weight_norm, 1e-30),
                     COST_MAX)


def tile_view_mask(weights: jnp.ndarray) -> jnp.ndarray:
    """Per-tile active-view bitmask for the fused kernel's view skipping.

    weights [H, W, V] (MHJVS weights, possibly already gated by selection):
    bit v of out[gi, gj] is set iff any pixel of the 8x128 tile (gi, gj) has
    weights[..., v] > 0.  Views with zero weight everywhere in a tile cannot
    contribute to any weighted cost there (APD.cu:1369-1374), so the kernel
    skips them exactly.
    """
    H, W, V = weights.shape
    assert V <= 31, "int32 tile bitmask holds at most 31 views"
    gi = -(-H // 8)
    gj = -(-W // 128)
    act = jnp.pad(weights > 0, ((0, gi * 8 - H), (0, gj * 128 - W), (0, 0)))
    act = jnp.any(act.reshape(gi, 8, gj, 128, V), axis=(1, 3))
    bits = jnp.sum(
        jnp.where(act, (1 << jnp.arange(V))[None, None, :], 0),
        axis=-1, dtype=jnp.int32)
    return bits
