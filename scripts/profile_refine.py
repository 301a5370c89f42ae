"""Time the REFINE_ITER weak-path stages individually at bench scale.

Each stage jits in isolation with representative inputs; per-pass cost =
stage time x calls/pass (6 half-iterations for per-half stages, 3 for
per-iteration, 1 for per-pass)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from dvpmvs.config import PMDynamic, PMStatic, PixelState, RunState
from dvpmvs.engine.packing import pack_ctx, pack_parity
from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import dist_to_origin
from dvpmvs.kernels.deformable import (anchor_cost_term,
                                       anchor_cost_term_for_plane,
                                       anchor_fields_at,
                                       AnchorFields, pack_anchor_fields)
from dvpmvs.kernels.geom import build_geom_context, geom_consistency_cost
from dvpmvs.kernels.ncc import build_cost_context, ncc_cost_batch
from dvpmvs.kernels.sweep import depth_to_weak, local_refine
from dvpmvs.kernels.weak import find_anchors, ransac_fit_plane
from dvpmvs.utils.synthetic import make_scene

H, W, V = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (608, 800, 10)
backend = sys.argv[4] if len(sys.argv) > 4 else "pallas"
WEAK_FRAC = 0.3
BUDGET = 0.5

scene = make_scene(num_views=5, height=H, width=W, seed=2)
ref_cam = scene.cameras[0]
reps = [1 + i % 4 for i in range(V)]
src_cams = stack_cameras([scene.cameras[i] for i in reps])
src_imgs = jnp.asarray(scene.images[reps])
ref_img = jnp.asarray(scene.images[0])
src_depths = jnp.asarray(scene.gt_depth[reps])
dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min),
                       depth_max=float(ref_cam.depth_max))

ys = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None], (H, W))
xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :], (H, W))
rx = (xs - ref_cam.cx) / ref_cam.fx
ry = (ys - ref_cam.cy) / ref_cam.fy
n = jnp.asarray(scene.gt_normal[0])
d0 = jnp.asarray(scene.gt_depth[0])
w0 = dist_to_origin(n, xs, ys, d0, ref_cam)
plane = jnp.concatenate([n, w0[..., None]], -1)
sel = jnp.ones((H, W, V), bool)
vw = jnp.ones((H, W, V)) / V
rng = np.random.default_rng(0)
weak = jnp.where(jnp.asarray(rng.uniform(size=(H, W)) < WEAK_FRAC),
                 PixelState.WEAK, PixelState.STRONG).astype(jnp.int8)
key = jax.random.PRNGKey(0)

mk = jax.jit(lambda ri, si: build_cost_context(
    ri, si, ref_cam, src_cams, dyn.sigma_spatial, dyn.sigma_color,
    strong_radius=5, backend=backend))
ctx = jax.block_until_ready(mk(ref_img, src_imgs))
mky = jax.jit(lambda ri, si: build_cost_context(
    ri, si, ref_cam, src_cams, dyn.sigma_spatial, dyn.sigma_color,
    strong_radius=5, backend=backend, color_only_weights=True))
ctx_yzl = jax.block_until_ready(mky(ref_img, src_imgs))
gctx = jax.block_until_ready(jax.jit(lambda sd: build_geom_context(
    sd, ref_cam, src_cams))(src_depths))
ctx_yzl_pk = pack_ctx(ctx_yzl, 0) if backend == "pallas" else None


def timeit(label, fn, *args, calls=1, n=3):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{label:44s} {dt*1e3:9.1f} ms x{calls} = {dt*calls:6.2f} s/pass",
          flush=True)
    return out


# ---- per-pass stages ----
anchors = timeit("find_anchors", lambda wk, pl: find_anchors(
    wk, pl, ref_cam, key, rotate_time=4,
    ransac_threshold=dyn.ransac_threshold,
    depth_range=dyn.depth_max - dyn.depth_min, use_limit=False),
    weak, plane, calls=1)

fitpl = timeit("ransac_fit_plane", lambda pl, wk: ransac_fit_plane(
    anchors, pl, wk, ref_cam, key, use_radius=True, strong_radius=5),
    plane, weak, calls=3)

timeit("depth_to_weak (geom)", lambda dd: depth_to_weak(
    ctx, gctx, dyn.geom_factor, plane[..., :3], dd, sel, vw, xs, ys,
    ref_cam, src_cams, dyn.depth_min, dyn.depth_max, dyn.weak_peak_radius),
    d0, calls=1)

timeit("local_refine (geom)", lambda dd: local_refine(
    ctx, gctx, dyn.geom_factor, plane[..., :3], dd, sel, vw, xs, ys,
    ref_cam, src_cams, dyn.depth_min, dyn.depth_max), d0, calls=1)

# ---- per-half-iteration weak stages (x6) ----
pk = lambda a: pack_parity(a, 0)
from dvpmvs.engine.patchmatch import _band_compact

SZ = (H * W) // 2
K_w = max(-(-int(SZ * BUDGET) // 128) * 128, 128)
flat_idx, ok_k = jax.jit(lambda w: _band_compact(w, K_w))(
    pk(weak == PixelState.WEAK))
gidx = jnp.minimum(flat_idx, SZ - 1)
af_k = timeit("anchor_fields_at (compacted)",
              lambda pl, sv: anchor_fields_at(
                  ctx_yzl, anchors, sv, ref_img, dyn.sigma_color, pk, gidx),
              plane, sel, calls=6)
slot_planes = jnp.broadcast_to(pk(plane)[None], (10, H // 1, W // 2, 4)) \
    if backend == "pallas" else jnp.broadcast_to(plane[None], (10, H, W, 4))
pl_k = slot_planes.reshape(10, SZ, 4)[:, gidx]

if backend == "pallas":
    from dvpmvs.kernels.anchor_pallas import anchor_slot_costs_from_ctx
    timeit(f"anchor_slot_costs_pallas x10 (K={K_w})",
           lambda p10: anchor_slot_costs_from_ctx(ctx_yzl, p10, af_k,
                                                  ok_k=ok_k),
           pl_k, calls=6)
    timeit(f"anchor_slot_costs_pallas x6 (refinement)",
           lambda p6: anchor_slot_costs_from_ctx(ctx_yzl, p6, af_k,
                                                 ok_k=ok_k),
           pl_k[:6], calls=6)
else:
    timeit(f"anchor_term_for_plane x10 (K={K_w})",
           lambda p10: jax.lax.map(
               lambda p: anchor_cost_term_for_plane(ctx_yzl, p, af_k), p10),
           pl_k, calls=6)

ctx_c = ctx_yzl_pk if backend == "pallas" else ctx_yzl
par = 0 if backend == "pallas" else None
timeit("ncc_cost_batch 10 slots (packed yzl)",
       lambda p10: ncc_cost_batch(ctx_c, p10, parity=par),
       slot_planes, calls=6)

timeit("ncc_cost_batch 6 slots (packed yzl)",
       lambda p6: ncc_cost_batch(ctx_c, p6, parity=par),
       slot_planes[:6], calls=6)

# geom batch: 10 + 6 slots, packed grid
from dvpmvs.engine.patchmatch import _geom_batch
xs_c, ys_c = pk(xs), pk(ys)
timeit("geom_batch 10 slots", lambda p10: _geom_batch(
    gctx, p10, xs_c, ys_c, ref_cam, backend, parity=par),
    slot_planes, calls=6)
timeit("geom_batch 6 slots", lambda p6: _geom_batch(
    gctx, p6, xs_c, ys_c, ref_cam, backend, parity=par),
    slot_planes[:6], calls=6)

from dvpmvs.kernels.propagation import mhjvs
cost_array = jnp.zeros((8,) + xs_c.shape + (V,))
flags = jnp.ones((8,) + xs_c.shape, bool)
prior = jnp.zeros(xs_c.shape + (V,))
timeit("mhjvs (weak)", lambda ca: mhjvs(key, ca, flags, prior, 0,
                                        num_samples=15),
       cost_array, calls=6)
