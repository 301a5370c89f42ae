"""PatchMatch per-view state pytree."""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


class PMState(struct.PyTreeNode):
    """Mutable per-view optimization state (device-resident pytree).

    Mirrors the reference's per-pixel device arrays (APD.cpp:1497-1613) in a
    functional form:
      plane        [H, W, 4]   (n_ref, w) compute-form hypotheses
      cost         [H, W]      current aggregated matching cost
      sel_views    [H, W, V]   bool selected-view set (bitmask equivalent)
      view_weights [H, W, V]   MHJVS Monte-Carlo view weights
      weak         [H, W]      int8 PixelState (WEAK/STRONG/UNKNOWN)
      radius       [H, W]      adaptive NCC radius (0 = default)
    """

    plane: jnp.ndarray
    cost: jnp.ndarray
    sel_views: jnp.ndarray
    view_weights: jnp.ndarray
    weak: jnp.ndarray
    radius: jnp.ndarray


class PassOutput(struct.PyTreeNode):
    """Results of one PatchMatch pass in persistence form.

    depth/normal are the world-form outputs written between passes
    (depths.dmb / APD_normals.dmb equivalents); weak/sel_views/view_weights
    feed the next pass.
    """

    depth: jnp.ndarray          # [H, W]
    normal_world: jnp.ndarray   # [H, W, 3]
    cost: jnp.ndarray           # [H, W]
    weak: jnp.ndarray           # [H, W] int8
    sel_views: jnp.ndarray      # [H, W, V] bool
    view_weights: jnp.ndarray   # [H, W, V]
    radius: jnp.ndarray         # [H, W]
    # Debug introspection (PMStatic.debug_dumps; None otherwise) — the
    # reference's DEBUG_COST_LINE / DEBUG_NEIGHBOUR buffers
    # (APD.cu:3990-3997, 4455-4470):
    cost_line: jnp.ndarray | None = None    # [61, H, W] sweep cost curves
    anchors_xy: jnp.ndarray | None = None   # [A, H, W, 2] int32 (x, y)
    anchors_valid: jnp.ndarray | None = None  # [A, H, W] bool
    # Weak-compaction budget overflow: max over checkerboard colors of
    # (initial weak count - K_w).  > 0 means some weak pixels fell back to
    # the center-window cost alone (silent accuracy cliff otherwise —
    # advisor r4); the runner surfaces it.  None when use_APD is off or
    # exact mode bypasses compaction.
    weak_overflow: jnp.ndarray | None = None  # int32 scalar
