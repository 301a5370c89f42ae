"""Geom Pallas kernel vs the XLA path (interpret mode on CPU)."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax, jax.numpy as jnp
from dvpmvs.geometry import stack_cameras
from dvpmvs.kernels.geom import build_geom_context, geom_consistency_cost
from dvpmvs.kernels.geom_pallas import geom_cost_pallas
from dvpmvs.utils.synthetic import make_scene

H, W, V, K = 48, 160, 3, 5
scene = make_scene(num_views=V + 1, height=H, width=W, seed=4)
ref = scene.cameras[0]
src_cams = stack_cameras(scene.cameras[1:])
src_depths = jnp.asarray(scene.gt_depth[1:])
gctx = build_geom_context(src_depths, ref, src_cams)

d0 = jnp.asarray(scene.gt_depth[0])
stack = jnp.stack([d0 * (1.0 + 0.02 * (k - K // 2)) for k in range(K)])

got = np.asarray(geom_cost_pallas(gctx, stack, interpret=True))  # [K,H,W,V]
want = np.stack([np.asarray(geom_consistency_cost(gctx, stack[k]))
                 for k in range(K)])
diff = np.abs(got - want)
print("per-view: median", np.median(diff), "p99", np.percentile(diff, 99),
      "max", diff.max())
assert np.median(diff) < 1e-4
assert (diff > 0.1).mean() < 0.01, (diff > 0.1).mean()

rng = np.random.default_rng(0)
vw = jnp.asarray(rng.uniform(0, 1, (H, W, V)).astype(np.float32))
gotf = np.asarray(geom_cost_pallas(gctx, stack, vweights=vw, fold=True,
                                   interpret=True))
wantf = np.sum(want * np.asarray(vw)[None], axis=-1)
df = np.abs(gotf - wantf)
print("fold: median", np.median(df), "max", df.max())
assert np.median(df) < 1e-4
print("OK")
