"""warp_field_pallas + packed anchor term vs the XLA path (interpret)."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax, jax.numpy as jnp
from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import dist_to_origin
from dvpmvs.kernels.ncc import build_cost_context, warp_field
from dvpmvs.kernels.sweep_pallas import warp_field_pallas
from dvpmvs.utils.synthetic import make_scene

H, W, V = 48, 160, 3
scene = make_scene(num_views=V + 1, height=H, width=W, seed=4)
ref = scene.cameras[0]
src_cams = stack_cameras(scene.cameras[1:])
src_imgs = jnp.asarray(scene.images[1:])
ref_img = jnp.asarray(scene.images[0])
ctx = build_cost_context(ref_img, src_imgs, ref, src_cams, 5.0, 3.0,
                         backend="pallas")
ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
n = jnp.asarray(scene.gt_normal[0]); d = jnp.asarray(scene.gt_depth[0])
w = dist_to_origin(n, xs, ys, d, ref)
plane = jnp.concatenate([n, w[..., None]], -1)

want_w, want_iv = warp_field(ctx, plane)
wd = jnp.where(jnp.abs(plane[..., 3]) < 1e-12, 1e-12, plane[..., 3])
invd = -(n[..., 0] * ctx.rx + n[..., 1] * ctx.ry + n[..., 2]) / wd
cam = jnp.stack([ctx.cam_cx, ctx.cam_cy,
                 jnp.asarray(ctx.inv_fx, jnp.float32),
                 jnp.asarray(ctx.inv_fy, jnp.float32)])
got_w, got_iv = warp_field_pallas(invd, ctx.rx, ctx.packed_quads, ctx.M,
                                  ctx.b, cam, ctx.src_wh, interpret=True)
dw = np.abs(np.asarray(got_w) - np.asarray(want_w))
div = (np.asarray(got_iv) != np.asarray(want_iv)).mean()
print("warp median", np.median(dw), "p99", np.percentile(dw, 99),
      "max", dw.max(), "inview mismatch", div)
assert np.median(dw) < 1.0          # u8 quantization
assert (dw > 8).mean() < 0.02, (dw > 8).mean()
assert div < 0.01
print("OK")
