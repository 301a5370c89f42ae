"""Ad-hoc correctness check of the fused v2 kernel vs exact.

Runs compiled on the default backend (TPU); set CHECK_CPU=1 for a CPU
interpret-mode run (tiny sizes only — interpret is slow).
"""
import os
INTERP = bool(int(os.environ.get("CHECK_CPU", "0")))
if INTERP:
    os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
import jax.numpy as jnp

from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import dist_to_origin
from dvpmvs.kernels.ncc import build_cost_context, ncc_cost_batch, _ncc_cost_exact
from dvpmvs.kernels.ncc_fused import fused_cost_from_ctx
from dvpmvs.utils.synthetic import make_scene

H, W = 48, 160
scene = make_scene(num_views=3, height=H, width=W, seed=4)
ref = scene.cameras[0]
src_cams = stack_cameras(scene.cameras[1:])
src_imgs = jnp.asarray(scene.images[1:])

ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
n = jnp.asarray(scene.gt_normal[0])
d = jnp.asarray(scene.gt_depth[0])
w = dist_to_origin(n, xs, ys, d, ref)
plane = jnp.concatenate([n, w[..., None]], -1)
planes = jnp.stack([plane, plane.at[..., 3].mul(1.1),
                    plane.at[..., 3].mul(1.4)])

for label, kw in [("default", {}), ("color_only", {"color_only_weights": True})]:
    ctx_e = build_cost_context(jnp.asarray(scene.images[0]), src_imgs, ref,
                               src_cams, 5.0, 3.0, backend="exact", **kw)
    ctx_p = build_cost_context(jnp.asarray(scene.images[0]), src_imgs, ref,
                               src_cams, 5.0, 3.0, backend="pallas", **kw)
    ce = np.stack([np.asarray(_ncc_cost_exact(ctx_e, p)) for p in planes])
    cp = np.asarray(fused_cost_from_ctx(ctx_p, planes, interpret=INTERP))
    diff = np.abs(ce - cp)
    print(f"{label}: median {np.median(diff):.5f} p99 "
          f"{np.percentile(diff, 99):.4f} max {diff.max():.4f}")
    assert np.median(diff) < 0.01 and (diff > 0.3).sum() == 0, label

# radius map
rad = jnp.full((H, W), 7.5).at[:, :50].set(5.0).at[:, 100:].set(10.0)
ctx_e = build_cost_context(jnp.asarray(scene.images[0]), src_imgs, ref,
                           src_cams, 5.0, 3.0, backend="exact",
                           radius_map=rad)
ctx_p = build_cost_context(jnp.asarray(scene.images[0]), src_imgs, ref,
                           src_cams, 5.0, 3.0, backend="pallas",
                           radius_map=rad)
ce = np.stack([np.asarray(_ncc_cost_exact(ctx_e, p)) for p in planes])
cp = np.asarray(fused_cost_from_ctx(ctx_p, planes, interpret=INTERP))
diff = np.abs(ce - cp)
print(f"radius_map: median {np.median(diff):.5f} p99 "
      f"{np.percentile(diff, 99):.4f} max {diff.max():.4f}")
assert np.median(diff) < 0.01 and (diff > 0.3).sum() == 0

# packed parity: pack fields then compare against the dense result
ctx_p = build_cost_context(jnp.asarray(scene.images[0]), src_imgs, ref,
                           src_cams, 5.0, 3.0, backend="pallas")
cp_dense = np.asarray(fused_cost_from_ctx(ctx_p, planes, interpret=INTERP))

from dvpmvs.engine.packing import pack_parity, pack_ctx
for color in (0, 1):
    ctx_k = pack_ctx(ctx_p, color)
    pk = jax.vmap(lambda p: pack_parity(p, color))(planes)
    cp_packed = np.asarray(fused_cost_from_ctx(ctx_k, pk, parity=color,
                                               interpret=INTERP))
    # compare against dense at the packed pixel positions
    ysf = np.arange(H)[:, None]
    Wp = (W + 1) // 2
    xf = 2 * np.arange(Wp)[None, :] + ((ysf + color) % 2)
    ok = xf < W
    ref_vals = cp_dense[:, ysf.repeat(Wp, 1), np.minimum(xf, W - 1)]
    diff = np.abs(ref_vals - cp_packed)[:, ok]
    print(f"packed c={color}: max {diff.max():.6f}")
    assert diff.max() < 1e-4

# view mask
Gi, Gj = -(-H // 8), -(-W // 128)
vm = jnp.full((Gi, Gj), 0b01, jnp.int32)   # only view 0 active
cm = np.asarray(fused_cost_from_ctx(ctx_p, planes, view_mask=vm,
                                    interpret=INTERP))
assert np.allclose(cm[..., 1], 2.0), cm[..., 1].min()
assert np.abs(cm[..., 0] - cp_dense[..., 0]).max() < 1e-5
print("view_mask ok")
print("ALL OK")
