"""Time a REFINE_ITER (geometric) pass with full weak machinery on TPU."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from dvpmvs.config import PMDynamic, PMStatic, RunState, PixelState
from dvpmvs.engine import run_pass
from dvpmvs.geometry import stack_cameras
from dvpmvs.utils.synthetic import make_scene

H, W, V = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (608, 800, 10)
backend = sys.argv[4] if len(sys.argv) > 4 else "pallas"
scene = make_scene(num_views=5, height=H, width=W, seed=2)
ref_cam = scene.cameras[0]
reps = [1 + i % 4 for i in range(V)]
src_cams = stack_cameras([scene.cameras[i] for i in reps])
src_imgs = jnp.asarray(scene.images[reps])
ref_img = jnp.asarray(scene.images[0])
src_depths = jnp.asarray(scene.gt_depth[reps])

static = PMStatic(state=RunState.REFINE_ITER, num_src=V, max_iterations=3,
                  cost_backend=backend, use_APD=True, geom_consistency=True,
                  use_edge=False, use_label=False)
dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min),
                       depth_max=float(ref_cam.depth_max))

n_world = jnp.einsum("ji,hwj->hwi", ref_cam.R, jnp.asarray(scene.gt_normal[0]))
d0 = jnp.asarray(scene.gt_depth[0]) * 1.01
init_world = jnp.concatenate([n_world, d0[..., None]], -1)
sel = jnp.ones((H, W, V), bool)
rng = np.random.default_rng(0)
weak = jnp.asarray((rng.uniform(size=(H, W)) < 0.3).astype(np.int8) * 0
                   + PixelState.STRONG).astype(jnp.int8)
weak = jnp.where(jnp.asarray(rng.uniform(size=(H, W)) < 0.3),
                 PixelState.WEAK, PixelState.STRONG).astype(jnp.int8)

fn = jax.jit(lambda ri, si, rc, sc, dd, kk: run_pass(
    ri, si, rc, sc, static, dd, kk, init_plane_world=init_world,
    init_sel_views=sel, init_weak=weak, src_depths=src_depths).depth)
args = (ref_img, src_imgs, ref_cam, src_cams, dyn, jax.random.PRNGKey(0))
t0 = time.time(); d = fn(*args); _ = float(jnp.sum(d))
print("compile+run", round(time.time() - t0, 1), flush=True)
t0 = time.time()
for _ in range(3):
    d = fn(*args); s = float(jnp.sum(d))
print("geom pass:", round((time.time() - t0) / 3, 2), "s")
gt = scene.gt_depth[0]
dd = np.asarray(d)
rel = abs(dd[8:-8, 8:-8] - gt[8:-8, 8:-8]) / np.maximum(gt[8:-8, 8:-8], 1e-6)
print("acc2%:", round(float(((rel < 0.02) & (dd[8:-8, 8:-8] > 0)).mean()), 4))
