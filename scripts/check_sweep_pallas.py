"""Correctness check: sweep Pallas kernel vs the warp-mode XLA path.

Both use warp-field semantics, so they must agree up to uint8 quad
quantization.  Runs in interpret mode on CPU (tiny sizes).
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import sys
import numpy as np
import jax
import jax.numpy as jnp

from dvpmvs.geometry import stack_cameras
from dvpmvs.kernels.ncc import build_cost_context, _ncc_cost_warp
from dvpmvs.kernels.sampling import plane_from_normal_depth
from dvpmvs.kernels.sweep_pallas import sweep_weighted_from_ctx
from dvpmvs.utils.synthetic import make_scene

H, W, V, K = 48, 160, 3, 7
k0 = K // 2
scene = make_scene(num_views=V + 1, height=H, width=W, seed=4)
ref = scene.cameras[0]
src_cams = stack_cameras(scene.cameras[1:])
src_imgs = jnp.asarray(scene.images[1:])
ref_img = jnp.asarray(scene.images[0])

ctx_w = build_cost_context(ref_img, src_imgs, ref, src_cams, 5.0, 3.0,
                           backend="warp")
ctx_p = build_cost_context(ref_img, src_imgs, ref, src_cams, 5.0, 3.0,
                           backend="pallas")

ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
normal = jnp.asarray(scene.gt_normal[0])
depth = jnp.asarray(scene.gt_depth[0])

rng = np.random.default_rng(0)
vw = jnp.asarray(rng.uniform(0.0, 1.0, (H, W, V)).astype(np.float32))

baseline = jnp.full((H, W), float(np.linalg.norm(
    np.asarray(ref.c) - np.asarray(src_cams.c[0]))), jnp.float32)
fx = float(ref.fx)

# pallas kernel (interpret)
got = sweep_weighted_from_ctx(ctx_p, depth, baseline, fx, vw, K=K, k0=k0,
                              interpret=True)
got = np.asarray(got)

# warp-mode XLA reference: per k, plane from (normal, depth_k), warp cost
disp = fx * baseline / jnp.maximum(depth, 1e-12)
want = []
for k in range(K):
    dk = fx * baseline / (disp + (k - k0))
    plane_k = plane_from_normal_depth(normal, dk, xs, ys, ref)
    cv = _ncc_cost_warp(ctx_w, plane_k)          # [H, W, V]
    want.append(np.asarray(jnp.sum(cv * vw, axis=-1)))
want = np.stack(want)

diff = np.abs(got - want)
# borders differ by design (shift2 wraps, the kernel edge-replicates);
# depth-discontinuity pixels differ via the DSPAN band clamp (shared with
# the fused candidate kernel) — the integration test gates classification
# agreement instead.
m = np.zeros((H, W), bool)
m[6:-6, 6:-6] = True
dm = diff[:, m]
print("median", np.median(dm), "p99", np.percentile(dm, 99),
      "max", dm.max())
bad = (dm > 0.5).mean()
print("frac>0.5:", bad)
assert np.median(dm) < 0.02, np.median(dm)
assert bad < 0.06, bad
print("OK")
