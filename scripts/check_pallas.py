import sys, numpy as np, jax, jax.numpy as jnp
from dvpmvs.utils.synthetic import make_scene
from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import dist_to_origin
from dvpmvs.kernels.ncc import build_cost_context, ncc_cost

H, W, V = 608, 896, 4
scene = make_scene(num_views=5, height=H, width=W, seed=4)
ref = scene.cameras[0]
src_cams = stack_cameras(scene.cameras[1:])
src_imgs = jnp.asarray(scene.images[1:])
ctx_e = jax.jit(lambda ri, si: build_cost_context(ri, si, ref, src_cams, 5.0, 3.0, backend="exact"))(jnp.asarray(scene.images[0]), src_imgs)
ctx_p = jax.jit(lambda ri, si: build_cost_context(ri, si, ref, src_cams, 5.0, 3.0, backend="pallas"))(jnp.asarray(scene.images[0]), src_imgs)
ys, xs = jnp.meshgrid(jnp.arange(H,dtype=jnp.float32), jnp.arange(W,dtype=jnp.float32), indexing='ij')
n = jnp.asarray(scene.gt_normal[0]); d = jnp.asarray(scene.gt_depth[0])
w = dist_to_origin(n, xs, ys, d, ref)
plane = jnp.concatenate([n, w[...,None]], -1)
ce = np.asarray(jax.block_until_ready(jax.jit(ncc_cost)(ctx_e, plane)))
cp = np.asarray(jax.block_until_ready(jax.jit(ncc_cost)(ctx_p, plane)))
diff = np.abs(ce - cp)
print('median', np.median(diff), 'p99', np.percentile(diff, 99), 'max', diff.max())
bad = np.argwhere(diff > 0.2)
print('bad>0.2 count:', len(bad), '/', diff.size)
if len(bad):
    print('bad rows histogram (y//8):', np.unique(bad[:,0]//8 % 4, return_counts=True))
    print('bad y range', bad[:,0].min(), bad[:,0].max(), 'x range', bad[:,1].min(), bad[:,1].max())
    print('sample', bad[:8].tolist())
