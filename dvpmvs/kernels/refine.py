"""Plane-hypothesis refinement candidate generation.

Oracle: ``PlaneHypothesisRefinementStrong`` (APD.cu:1311-1383) /
``...Weak`` (APD.cu:1897-2008): six candidate planes per pixel built from
{random depth, current depth, perturbed depth} x {current normal, random
visibility-prior normal, perturbed normal}:

    depths  = [d_rand, d_cur,  d_rand, d_cur,   d_cur,   d_pert]
    normals = [n_cur,  n_rand, n_rand, n_pert1, n_pert2, n_cur ]

The perturbation here is real (the reference's GeneratePerturbedNormal is a
no-op — quirk Q3, SURVEY §2.5).  Candidates are returned as a [6, H, W, 4]
plane stack; the engine evaluates and adopts sequentially-best as the
reference does (argmin with current as baseline).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.camera import Camera
from .sampling import (perturbed_normal, plane_from_normal_depth,
                       random_depth, visibility_prior_normal)

DEPTH_PERTURBATION = 0.02
NORMAL_PERTURBATION = 0.02 * jnp.pi


def refinement_planes(
    key: jax.Array,
    cur_normal: jnp.ndarray,    # [H, W, 3] (ref frame)
    cur_depth: jnp.ndarray,     # [H, W]
    sel_views: jnp.ndarray,     # [H, W, V] bool
    rx: jnp.ndarray, ry: jnp.ndarray,
    xs: jnp.ndarray, ys: jnp.ndarray,
    ref_cam: Camera, src_cams: Camera,
    depth_min, depth_max,
) -> jnp.ndarray:
    """Build the 6 refinement candidate planes -> [6, H, W, 4]."""
    H, W = cur_depth.shape
    k_rand_d, k_rand_n, k_pert1, k_pert2, k_pert_d = jax.random.split(key, 5)

    d_rand = random_depth(k_rand_d, (H, W), depth_min, depth_max)
    n_rand = visibility_prior_normal(k_rand_n, cur_depth, sel_views, rx, ry,
                                     ref_cam, src_cams)
    n_pert1 = perturbed_normal(k_pert1, cur_normal, rx, ry, NORMAL_PERTURBATION)
    n_pert2 = perturbed_normal(k_pert2, cur_normal, rx, ry, NORMAL_PERTURBATION)
    d_pert = cur_depth * jax.random.uniform(
        k_pert_d, (H, W), minval=1.0 - DEPTH_PERTURBATION,
        maxval=1.0 + DEPTH_PERTURBATION)

    combos = [
        (d_rand, cur_normal),
        (cur_depth, n_rand),
        (d_rand, n_rand),
        (cur_depth, n_pert1),
        (cur_depth, n_pert2),
        (d_pert, cur_normal),
    ]
    planes = [plane_from_normal_depth(n, d, xs, ys, ref_cam)
              for d, n in combos]
    return jnp.stack(planes)
