"""dvpmvs — a TPU-native PatchMatch multi-view-stereo engine.

A from-scratch JAX/XLA/Pallas re-design of the DVP-MVS pipeline
("DVP-MVS: Synergize Depth-Edge and Visibility Prior for Multi-View Stereo",
AAAI 2025; reference CUDA implementation surveyed in SURVEY.md).

Layers (bottom-up):
  geometry/  pure-jnp camera math: projections, plane<->depth, homographies
  io/        scene formats: pair.txt, cam.txt, .dmb/.bin, PLY, COLMAP converter
  kernels/   the hot compute path: batched bilateral-NCC cost, checkerboard
             propagation, plane refinement, median filter, disparity sweeps,
             weak-pixel (deformable patch) machinery — jnp reference + Pallas
  priors/    depth-edge prior (Roberts/Canny + labeling), mono-depth prior
             (Depth-Anything-V2-style Flax ViT + SfM scale alignment)
  engine/    per-view PatchMatch state machine (jitted pass over a pytree)
  sched/     multi-scale / multi-pass schedule and the per-scene runner
  dist/      device mesh, view sharding, cross-view depth exchange
  fusion/    cross-view consistency filtering + point-cloud fusion
  cli/       command-line entry points
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry (homographies, reprojection) needs true f32 contractions; TPU
# matmuls otherwise default to bf16 and corrupt sub-pixel coordinates.
# Compute-heavy neural parts (priors ViT) opt into bf16 explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")
