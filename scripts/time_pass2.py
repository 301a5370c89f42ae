import time, sys, jax, jax.numpy as jnp, numpy as np
from dvpmvs.config import PMDynamic, PMStatic, RunState
from dvpmvs.engine import run_pass
from dvpmvs.geometry import stack_cameras
from dvpmvs.utils.synthetic import make_scene
H, W, backend = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
scene = make_scene(num_views=5, height=H, width=W, seed=2)
ref_cam = scene.cameras[0]
src_ids=[1,2,3,4]
src_cams = stack_cameras([scene.cameras[i] for i in src_ids])
static = PMStatic(state=RunState.FIRST_INIT, num_src=4, max_iterations=3, cost_backend=backend)
dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min), depth_max=float(ref_cam.depth_max))
fn = jax.jit(lambda ri, si, rc, sc, dd, kk: run_pass(ri, si, rc, sc, static, dd, kk))
args = (jnp.asarray(scene.images[0]), jnp.asarray(scene.images[src_ids]), ref_cam, src_cams, dyn, jax.random.PRNGKey(0))
t0=time.time(); out = fn(*args); out.depth.block_until_ready(); print('compile+run', round(time.time()-t0,1), flush=True)
t0=time.time(); out = fn(*args); out.depth.block_until_ready(); print('run', round(time.time()-t0,2), flush=True)
gt = scene.gt_depth[0]; d = np.asarray(out.depth)
rel = abs(d[8:-8,8:-8]-gt[8:-8,8:-8])/np.maximum(gt[8:-8,8:-8],1e-6)
print('acc2%:', round(float(((rel<0.02)&(d[8:-8,8:-8]>0)).mean()),4))
