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

import math
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


def _extended_offsets(offsets: List[Tuple[int, int]], ext_round: int
                      ) -> List[Tuple[int, int]]:
    """Offsets of extension round ``ext_round`` (0..2).

    Far rays push their base 10*round further out (ExtendedUpFarPropagation,
    APD.cu:1392: 5 + 2*round*5 rows); V-sweeps push both axes by 8*round
    (ExtendedLeftUpPropagation, APD.cu:1624-1625).  Round 0 therefore
    re-scans the initial offsets (and almost never replaces: the re-scan's
    minimum cannot beat the already-selected one strictly).
    """
    push = (10 if len(offsets) == 5 else 8) * ext_round
    return [(x + int(np.sign(x)) * push, y + int(np.sign(y)) * push)
            for (x, y) in offsets]


def select_candidates(
    plane: jnp.ndarray,        # [H, W, 4]
    cost: jnp.ndarray,         # [H, W]
    ray: jnp.ndarray,          # [H, W, 3] normalized per-pixel ref ray
    strong_ok: jnp.ndarray | None = None,   # [H, W] propagation sources mask
    extend_round: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pre-select the best candidate plane per direction by cost-map scan.

    Returns (cand_planes [8, H, W, 4], flags [8, H, W], map_costs
    [8, H, W] — the selected sample's *cost-map* value, which extension
    rounds compare against).  ``strong_ok`` restricts propagation *sources*
    (the weak pass only accepts anchors that are STRONG; the strong pass
    accepts any pixel, as the reference does).  ``extend_round`` >= 0
    selects that extension round's pushed offsets (APD.cu:1385-1895); the
    base sample then also gets no facing test, like the initial base.
    """
    H, W = cost.shape
    cand_planes = []
    flags = []
    map_costs = []
    for d, offsets in enumerate(DIRECTIONS):
        if extend_round >= 0:
            offsets = _extended_offsets(offsets, extend_round)
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
        map_costs.append(best_cost)
    return jnp.stack(cand_planes), jnp.stack(flags), jnp.stack(map_costs)


# ---------------------------------------------------------------------------
# Edge-adaptive strong propagation (the use_edge branch, APD.cu:2038-2140).
# This is the reference's DEFAULT strong-propagation path (use_edge is true in
# main.h and never cleared): per-direction step count/length adapt to the
# distance-to-nearest-edge along that direction, and non-edge pixels also run
# a fixed short-range (11 x 2) scan whose candidate competes with the
# adaptive one by per-view good/bad cost counts (decided in the engine, where
# the NCC vectors of both candidates are available).
# ---------------------------------------------------------------------------

# Direction order of the edge branch (APD.cu:2039) == weak._RAY_DIRS ==
# edge_ray_distance's output order.
EDGE_DIRS = ((0, -1), (0, 1), (-1, 0), (1, 0),
             (-1, -1), (1, 1), (-1, 1), (1, -1))

# Per-direction extra pixel nudge (APD.cu:2070-2072: dirs with index > 4 get
# +dx on odd indices / +dy on even; dir 4 gets none — reference quirk).
_EDGE_NUDGE = ((0, 0), (0, 0), (0, 0), (0, 0),
               (0, 0), (1, 0), (0, 1), (1, 0))


def edge_step_lengths(H: int, W: int, diag: bool) -> list:
    """Statically possible step_len values for an image extent.

    step_num = clamp(dist/2, 11, 22), step_len = max(int(dist/step_num), 2)
    (axis dirs rounded down to even), dist <= max(H, W)/30 steps (axis) or
    /30/sqrt2 (diagonal), so the reachable set is tiny and static.
    """
    cap = max(H, W) / 30.0
    if diag:
        cap /= math.sqrt(2.0)
    lmax = max(2, int(cap / 22))
    if diag:
        return list(range(2, lmax + 1))
    return [2] + [l for l in range(4, lmax + 1, 2)]


def select_candidates_edge(
    plane: jnp.ndarray,        # [H, W, 4]
    cost: jnp.ndarray,         # [H, W]
    edge: jnp.ndarray,         # [H, W] bool edge mask
    edge_dist: jnp.ndarray,    # [8, H, W] euclidean dist to edge (weak.py)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Edge-adaptive candidate pre-selection (APD.cu:2038-2140).

    Returns (cand1 [8, H, W, 4], flags1 [8, H, W], cand2, flags2,
    differs [8, H, W]): the adaptive-scan candidate, the fixed short-range
    scan candidate (non-edge pixels only in the reference; computed for all,
    the engine gates by ``edge``), and whether the two picked different
    source pixels (where they coincide the engine can reuse candidate 1's
    NCC vector instead of evaluating candidate 2).
    """
    H, W = cost.shape
    sq2 = math.sqrt(2.0)
    max_d = max(H, W) / 30.0

    cand1, flags1, cand2, flags2, differs = [], [], [], [], []
    for d, (dx, dy) in enumerate(EDGE_DIRS):
        diag = d >= 4
        fx, fy = _EDGE_NUDGE[d]
        # per-pixel steps-to-edge along this ray (APD.cu:2054-2062)
        dist = edge_dist[d] / (sq2 if diag else 1.0)
        nohit = edge_dist[d] >= 1e8
        cap = max_d / (sq2 if diag else 1.0)
        dist = jnp.where(nohit | (dist >= max_d), cap, dist)
        dist = jnp.where(edge, 22.0, dist)
        step_num = jnp.clip((dist * 0.5).astype(jnp.int32), 11, 22)
        step_len = jnp.maximum(
            (dist / step_num.astype(jnp.float32)).astype(jnp.int32), 2)
        if not diag:
            step_len = step_len - step_len % 2

        # static bound on step_num = clamp(int(dist * 0.5), 11, 22): the cap
        # above reproduces the reference quirk of comparing dist >= max_d
        # AFTER the /sqrt2 division (APD.cu:2054-2062), so even on diagonal
        # directions dist can reach max_d (values in (max_d/sqrt2, max_d) are
        # NOT clamped).  The static prune must therefore use max_d for both
        # axis and diagonal directions; steps past int(max_d*0.5) are dead
        # for every pixel — at <=1320 px extents this prunes 22 -> <=13.
        #
        # The scan materializes ALL (L, s) candidates as one stack and
        # reduces with argmin (strict-<-first semantics == the sequential
        # running min): the sequential where-chain emitted one tiny XLA
        # kernel per step (launch-bound, 44 ms/half at 608x800 on v5e);
        # the stack + reduce fuses into a handful.
        s_max = min(22, max(11, int(max_d * 0.5)))
        cands, oks, offs = [], [], []
        short_sel = []
        for L in edge_step_lengths(H, W, diag):
            sel_L = step_len == L
            for s in range(s_max):
                ox = 5 * dx + s * L * dx + fx
                oy = 5 * dy + s * L * dy + fy
                inb = _in_bounds_mask(H, W, ox, oy)
                cands.append(shift_map(cost, ox, oy))
                oks.append(sel_L & inb & (s < step_num))
                offs.append(oy * W + ox)
                short_sel.append((L == 2 and s < 11, inb))
        cstack = jnp.stack(cands)                       # [S, H, W]
        ok1 = jnp.stack(oks)
        S = len(cands)
        Ls = edge_step_lengths(H, W, diag)

        def first_min_idx(work):
            """argmin as two single-dtype reduces (the variadic
            (value, index) reduce lowers poorly on TPU)."""
            m = jnp.min(work, axis=0)
            kio = jax.lax.broadcasted_iota(jnp.int32, work.shape, 0)
            return jnp.min(jnp.where(work == m[None], kio, S), axis=0)

        def idx_to_off(arg, rows):
            """Flat offset from the stack index by ARITHMETIC — off is
            affine in (L, s) and even a [S]-table gather by a [H, W]
            index field costs milliseconds on TPU."""
            arg = jnp.clip(arg, 0, len(rows) - 1)
            li = [offs_meta[i][0] for i in rows]      # python ints
            sv = [offs_meta[i][1] for i in rows]
            if len(set(li)) == 1:
                Lv = Ls[li[0]]
                sval = arg + sv[0]
                sL = sval * Lv
            else:
                # few L variants: where-chain over the static row table
                sL = jnp.zeros_like(arg)
                for i in range(len(rows)):
                    sL = jnp.where(arg == i, sv[i] * Ls[li[i]], sL)
            return (5 * dx + fx + W * (5 * dy + fy)
                    + sL * (dx + W * dy))

        offs_meta = []
        for li_, L in enumerate(Ls):
            for s in range(s_max):
                offs_meta.append((li_, s))

        work1 = jnp.where(ok1, cstack, jnp.inf)
        arg1 = first_min_idx(work1)
        got1 = jnp.any(ok1, axis=0)
        best_off = idx_to_off(arg1, list(range(S)))

        srows = [i for i, (is_s, _) in enumerate(short_sel) if is_s]
        ok2 = jnp.stack([short_sel[i][1] for i in srows])
        work2 = jnp.where(ok2, cstack[jnp.asarray(srows)], jnp.inf)
        arg2 = first_min_idx(work2)
        got2 = jnp.any(ok2, axis=0)
        short_off = idx_to_off(arg2, srows)

        # Candidate planes by roll + select instead of a flat gather: the
        # source offsets are STATIC per stack row, so 13 rolled copies of
        # the plane field selected by the (tiny-range) argmin fuse into
        # elementwise kernels — the dense [8, H, W] gather of plane rows
        # was ~40 ms/call at 608x800 on v5e, ~20x this form.  (Wrap-around
        # at borders replaces the old clipped-flat-index junk; both are
        # gated by the flags downstream.)
        a1c = jnp.clip(arg1, 0, S - 1)
        a2c = jnp.clip(arg2, 0, len(srows) - 1)
        p1 = jnp.zeros((H, W, 4), plane.dtype)
        p2 = jnp.zeros((H, W, 4), plane.dtype)
        for k in range(S):
            li_, s = offs_meta[k]
            L = Ls[li_]
            ox = 5 * dx + s * L * dx + fx
            oy = 5 * dy + s * L * dy + fy
            rolled = jnp.roll(plane, (-oy, -ox), (0, 1))
            p1 = jnp.where((a1c == k)[..., None], rolled, p1)
            if k in srows:
                k2 = srows.index(k)
                p2 = jnp.where((a2c == k2)[..., None], rolled, p2)
        cand1.append(p1)
        cand2.append(p2)
        flags1.append(got1)
        flags2.append(got2)
        differs.append(got1 & got2 & (best_off != short_off))
    return (jnp.stack(cand1), jnp.stack(flags1),
            jnp.stack(cand2), jnp.stack(flags2), jnp.stack(differs))


def edge_candidate_merge(
    edge: jnp.ndarray,          # [H, W] (or packed) bool
    flags1, flags2, differs,    # [8, H, W]
    ca1: jnp.ndarray,           # [8, H, W, V] NCC vectors of candidate 1
    ca2: jnp.ndarray,           # [8, H, W, V] NCC vectors of candidate 2
    cand1: jnp.ndarray,         # [8, H, W, 4]
    cand2: jnp.ndarray,
    iter_idx,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Good/bad-view-count comparison of the two scans (APD.cu:2090-2140).

    Non-edge pixels replace the adaptive candidate with the short-range one
    when the latter has strictly more views under the good threshold, or
    equal good and fewer views over the bad threshold — or when the adaptive
    scan found nothing.  Returns (cost_array [8, H, W, V], cand [8, H, W, 4],
    flags [8, H, W]).
    """
    it = jnp.asarray(iter_idx, jnp.float32)
    good_thr = 0.8 * jnp.exp(it * it / -90.0)
    # where the two scans picked the same pixel the engine fed ca1 for both
    ca2 = jnp.where(differs[..., None], ca2, ca1)
    good1 = jnp.sum(ca1 < good_thr, axis=-1)
    bad1 = jnp.sum(ca1 > 1.2, axis=-1)
    good2 = jnp.sum(ca2 < good_thr, axis=-1)
    bad2 = jnp.sum(ca2 > 1.2, axis=-1)
    replace = (~edge[None]) & flags2 & (
        ~flags1 | (good2 > good1) | ((good2 == good1) & (bad2 < bad1)))
    cost_array = jnp.where(replace[..., None], ca2, ca1)
    cand = jnp.where(replace[..., None], cand2, cand1)
    flags = flags1 | (flags2 & ~edge[None])
    return cost_array, cand, flags


def judge_extend(iter_idx: jnp.ndarray, ext_round: int,
                 cost_array: jnp.ndarray, flags: jnp.ndarray) -> jnp.ndarray:
    """Per-(dir, pixel) gate for extended propagation (JudgeExtend,
    APD.cu:1872-1896): extend while the direction's candidate is still BAD —
    i.e. NOT (>=1 view below 0.8*exp(-iter^2 (3-ext)/90) and <=2 views above
    1.2).  A direction that turns good stops extending permanently (the
    caller must AND gates cumulatively, mirroring symbol_eight_orientations).

    cost_array [8, H, W, V], flags [8, H, W] -> bool [8, H, W].
    """
    it = jnp.asarray(iter_idx, jnp.float32)
    good_thr = 0.8 * jnp.exp(it * it * (3.0 - ext_round) / -90.0)
    good = jnp.sum(cost_array < good_thr, axis=-1)
    bad = jnp.sum(cost_array > 1.2, axis=-1)
    return flags & ~((good >= 1) & (bad <= 2))


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


def tile_plane_mask(active: jnp.ndarray) -> jnp.ndarray:
    """Per-tile active-plane bitmask for the fused kernel's plane skipping.

    active [B, H', W'] bool (plane b needed at pixel): bit b of out[gi, gj]
    is set iff any pixel of the 8x128 tile needs plane b.  Pixels whose bit
    is off read cost_max for that plane — callers must substitute a fallback
    vector there (they only consult masked planes where active).
    """
    B, H, W = active.shape
    assert B <= 31, "int32 tile bitmask holds at most 31 planes"
    gi = -(-H // 8)
    gj = -(-W // 128)
    act = jnp.pad(active, ((0, 0), (0, gi * 8 - H), (0, gj * 128 - W)))
    act = jnp.any(act.reshape(B, gi, 8, gj, 128), axis=(2, 4))
    bits = jnp.sum(
        jnp.where(act, (1 << jnp.arange(B))[:, None, None], 0),
        axis=0, dtype=jnp.int32)
    return bits


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
