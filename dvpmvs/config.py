"""Configuration layer.

The reference has no runtime config (hard-coded `PatchMatchParams` defaults in
`main.h:86-112` mutated by the schedule in `main.cpp:450-512`).  Here the same
tunables are split into:

  * `PMStatic`   — hashable, shape/control-flow-affecting parameters.  Passed
    to jitted functions as static arguments; a new value triggers a recompile
    (which per-round shape changes force anyway).
  * `PMDynamic`  — a small pytree of scalars that participate only in
    arithmetic.  Changing them does NOT recompile.
  * `SceneConfig` — dataset / schedule / output options (host-side only).

Reference parameter defaults: main.h:86-112.
"""

from __future__ import annotations

import dataclasses
from enum import IntEnum
from typing import Tuple

import jax.numpy as jnp
from flax import struct


class RunState(IntEnum):
    """Pass modes (reference: ``RunState``, main.h:74-78)."""

    FIRST_INIT = 0   # round 0 photometric pass: mono-prior / random init
    REFINE_INIT = 1  # round >0 photometric pass: upscaled previous state
    REFINE_ITER = 2  # geometric-consistency passes


class PixelState(IntEnum):
    """Per-pixel classification (reference: ``PixelState``, main.h:80-84)."""

    WEAK = 0
    STRONG = 1
    UNKNOWN = 2


@dataclasses.dataclass(frozen=True)
class PMStatic:
    """Shape- and control-flow-affecting PatchMatch parameters (static)."""

    state: RunState = RunState.FIRST_INIT
    num_src: int = 0                # source views for this problem (padded)
    max_iterations: int = 3         # checkerboard iterations per pass
    top_k: int = 4                  # initial view selection top-k
    strong_radius: int = 5          # full-window NCC: half extent
    strong_increment: int = 2       # full-window NCC: tap stride
    weak_radius: int = 5            # deformable NCC sparse-patch extent
    weak_increment: int = 5
    rotate_time: int = 4            # anchor-ray rotations (weak machinery)
    geom_consistency: bool = False
    # Feature flags: reference defaults (main.h:99-106) — use_edge/use_limit/
    # use_label/use_radius all default true and are never cleared by the
    # schedule; use_APD/use_detail are schedule-controlled.
    use_APD: bool = False           # weak-pixel (deformable patch) machinery
    use_edge: bool = True           # edge-adaptive propagation / anchor limits
    use_limit: bool = True          # Bresenham edge-crossing anchor test
    use_label: bool = True          # segmentation-label anchor augmentation
    use_detail: bool = False        # demote edge pixels to UNKNOWN (REFINE_INIT)
    use_radius: bool = True         # per-pixel adaptive NCC radius
    view_samples: int = 15          # Monte-Carlo draws in MHJVS
    max_views: int = 32             # reference MAX_IMAGES (bitmask width)
    neighbour_num: int = 12         # 1 center + 11 anchors (reference NEIGHBOUR_NUM)
    extend_rounds: int = 3          # extended far-propagation rounds (0..3);
                                    # only the non-edge ACMM branch uses them
                                    # (APD.cu:2386-2460)
    exact_deformable: bool = False  # reference-exact per-anchor sparse-patch
                                    # weak cost (gather-bound oracle; the
                                    # default is the warp-field approximation
                                    # in kernels/deformable.py)
    # Sparse-patch taps per (anchor, view) in the PRODUCTION anchor term:
    # 1 = anchor center only (default); 2..3 add the reference's per-view
    # visibility-aware patch-candidate offsets (APD.cu:3744-3794, consumed
    # at 940-1004) as extra samples of the grouped anchor NCC — the taps
    # ride the same banded-gather kernel (kernels/anchor_pallas.py), at
    # ~T x its gather cost.  Differs from the reference's per-anchor 9-tap
    # NCC (exact_deformable) in grouping only; empty candidate slots fall
    # back to the fixed +-5 grid exactly as the reference does.
    anchor_taps: int = 1
    # Weak-pixel compaction budget as a fraction of the evaluation grid:
    # the slot-exact anchor terms compute only at this many compacted weak
    # indices (gather-bound — the dominant REFINE_ITER cost).  Weak pixels
    # beyond the budget keep the shared anchor term (graceful).  The scene
    # runner rounds the measured weak fraction up to a bucket so recompiles
    # stay bounded (sched/runner.py).
    weak_budget_frac: float = 0.5
    # Per-pixel introspection: return the disparity-sweep cost curves and
    # the anchor lists in PassOutput (the reference's DEBUG_COST_LINE /
    # DEBUG_NEIGHBOUR compile-time dumps, APD.cu:3990-4524); the scene
    # runner writes them to the result folder in the reference's binary
    # layouts.  Debug only — materializes [61, H, W] f32 per pass.
    debug_dumps: bool = False
    # NCC backend: "exact" = per-center-plane window warp via XLA gathers
    # (reference-faithful, gather-bound); "pallas" = banded-gather TPU kernel
    # (reference-faithful, fast); "warp" = warp-once approximation (fastest,
    # degrades convergence from random init — see kernels/ncc.py).
    cost_backend: str = "exact"

    def replace(self, **kw) -> "PMStatic":
        return dataclasses.replace(self, **kw)


class PMDynamic(struct.PyTreeNode):
    """Arithmetic-only PatchMatch parameters (a pytree of f32 scalars)."""

    depth_min: jnp.ndarray
    depth_max: jnp.ndarray
    sigma_spatial: jnp.ndarray
    sigma_color: jnp.ndarray
    geom_factor: jnp.ndarray
    ransac_threshold: jnp.ndarray
    weak_peak_radius: jnp.ndarray   # int-valued but compared only

    @classmethod
    def create(
        cls,
        depth_min: float = 0.0,
        depth_max: float = 1.0,
        sigma_spatial: float = 5.0,
        sigma_color: float = 3.0,
        geom_factor: float = 0.2,
        ransac_threshold: float = 0.005,
        weak_peak_radius: float = 6.0,
    ) -> "PMDynamic":
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(
            depth_min=f(depth_min),
            depth_max=f(depth_max),
            sigma_spatial=f(sigma_spatial),
            sigma_color=f(sigma_color),
            geom_factor=f(geom_factor),
            ransac_threshold=f(ransac_threshold),
            weak_peak_radius=f(weak_peak_radius),
        )


@dataclasses.dataclass
class SceneConfig:
    """Host-side scene/schedule options (reference: CLI args + hard-coded)."""

    dense_folder: str = ""
    output_folder: str = ""            # defaults to <dense_folder>/APD
    max_base_size: int = 800           # pyramid: halve until maxdim <= this
    geometric_passes: int = 3          # geometric passes per round
    fusion_variant: str = "eth3d"      # eth3d | tat_intermediate | tat_advanced
    show_medium_result: bool = False
    use_mono_prior: bool = True        # FIRST_INIT Depth-Anything bootstrap
    use_priors: bool = True            # edge/label priors
    full_res_round: bool = False       # add the full-resolution round the
                                       # reference never runs (main.cpp:450
                                       # stops at i < round_num - 1, scale 2)
    seed: int = 0
    # distribution
    mesh_views: int = 1                # devices along the view axis
    mesh_tiles: int = 1                # devices along the image-row axis
                                       # (Phase B, dist.tiles; per-view
                                       # passes row-shard when H divides)
    dtype: str = "float32"


# Reference schedule (main.cpp:450-512): per round i of R rounds,
#   photometric pass:  i==0 -> FIRST_INIT,  use_APD=False
#                      i>0  -> REFINE_INIT, use_APD=True,
#                              ransac_threshold = 0.01 - 0.00125*i,
#                              rotate_time = min(2**i, 4),
#                              use_detail = (i < R-1)
#   then 3 geometric passes: REFINE_ITER, geom_consistency=True,
#                            weak_peak_radius = max(4 - 2*j, 2)
def round_pass_params(
    round_idx: int,
    num_rounds: int,
    pass_idx: int,
    base_static: PMStatic,
    depth_min: float,
    depth_max: float,
) -> Tuple[PMStatic, PMDynamic]:
    """Build (static, dynamic) params for (round, pass) following the
    reference schedule.  ``pass_idx`` 0 is photometric, >=1 geometric."""

    i = round_idx
    st = base_static
    # photometric i=0 keeps the 0.005 default (FIRST_INIT, use_APD=false —
    # unused); all other passes get the schedule value (main.cpp:468, 496)
    ransac_threshold = 0.01 - i * 0.00125
    weak_peak_radius = 6.0
    if pass_idx == 0:
        if i == 0:
            ransac_threshold = 0.005
            st = st.replace(state=RunState.FIRST_INIT, use_APD=False,
                            geom_consistency=False)
        else:
            st = st.replace(
                state=RunState.REFINE_INIT,
                use_APD=True,
                rotate_time=min(2 ** i, 4),
                use_detail=(i < num_rounds - 1),
                geom_consistency=False,
            )
    else:
        j = pass_idx - 1
        weak_peak_radius = float(max(4 - 2 * j, 2))
        st = st.replace(
            state=RunState.REFINE_ITER,
            use_APD=(i > 0),
            rotate_time=min(2 ** i, 4) if i > 0 else base_static.rotate_time,
            geom_consistency=True,
        )
    dyn = PMDynamic.create(
        depth_min=depth_min,
        depth_max=depth_max,
        ransac_threshold=ransac_threshold,
        weak_peak_radius=weak_peak_radius,
    )
    return st, dyn


def num_rounds_for(width: int, height: int, max_base_size: int = 800) -> int:
    """Pyramid round count (reference ``ComputeRoundNum``, main.cpp:248-264)."""
    max_size = max(width, height)
    rounds = 1
    while max_size > max_base_size:
        max_size //= 2
        rounds += 1
    return rounds
