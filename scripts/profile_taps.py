"""Time the sparse-patch tap mode (PMStatic.anchor_taps) on TPU at bench
scale: the extended anchor kernel call, the per-half-iteration tap-word
gather, the once-per-pass field packing, and the full REFINE_ITER pass at
anchor_taps in {1, 3}."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from dvpmvs.config import PMDynamic, PMStatic, PixelState, RunState
from dvpmvs.engine import run_pass
from dvpmvs.engine.packing import pack_parity
from dvpmvs.engine.patchmatch import _band_compact
from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import dist_to_origin
from dvpmvs.kernels.deformable import (anchor_fields_at, gather_tap_words,
                                       pack_tap_fields)
from dvpmvs.kernels.ncc import build_cost_context
from dvpmvs.kernels.weak import find_anchors, patch_candidates
from dvpmvs.utils.synthetic import make_scene

H, W, V = 608, 800, 10
backend = "pallas" if jax.default_backend() != "cpu" else "exact"
scene = make_scene(num_views=5, height=H, width=W, seed=2)
ref_cam = scene.cameras[0]
reps = [1 + i % 4 for i in range(V)]
src_cams = stack_cameras([scene.cameras[i] for i in reps])
src_imgs = jnp.asarray(scene.images[reps])
ref_img = jnp.asarray(scene.images[0])
dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min),
                       depth_max=float(ref_cam.depth_max))
rng = np.random.default_rng(0)
weak = jnp.where(jnp.asarray(rng.uniform(size=(H, W)) < 0.3),
                 PixelState.WEAK, PixelState.STRONG).astype(jnp.int8)
sel = jnp.ones((H, W, V), bool)
key = jax.random.PRNGKey(0)

ys = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None], (H, W))
xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :], (H, W))
n = jnp.asarray(scene.gt_normal[0])
d0 = jnp.asarray(scene.gt_depth[0])
w0 = dist_to_origin(n, xs, ys, d0, ref_cam)
plane = jnp.concatenate([n, w0[..., None]], -1)


def timeit(label, fn, *args, calls=1, n_rep=3):
    f = jax.jit(fn)
    t0 = time.time()
    out = jax.block_until_ready(f(*args))
    dt_c = time.time() - t0
    t0 = time.time()
    for _ in range(n_rep):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n_rep
    print(f"{label:44s} {dt*1e3:9.1f} ms x{calls} = {dt*calls:6.2f} s/pass"
          f"   (compile {dt_c:5.1f} s)", flush=True)
    return out


ctx_yzl = jax.block_until_ready(jax.jit(lambda ri, si: build_cost_context(
    ri, si, ref_cam, src_cams, dyn.sigma_spatial, dyn.sigma_color,
    strong_radius=5, backend=backend, color_only_weights=True))(
        ref_img, src_imgs))
anchors = jax.block_until_ready(jax.jit(lambda wk, pl_: find_anchors(
    wk, pl_, ref_cam, key, rotate_time=4,
    ransac_threshold=dyn.ransac_threshold,
    depth_range=dyn.depth_max - dyn.depth_min, use_limit=False))(weak, plane))

FULL_ONLY = "--full-only" in sys.argv

po = timeit("patch_candidates (per pass)", lambda: patch_candidates(
    ref_img, sel, dyn.sigma_color, weak_radius=5), calls=1)
tf = timeit("pack_tap_fields (per pass)", lambda: pack_tap_fields(
    ref_img, po, 2), calls=1)

pk = lambda a: pack_parity(a, 0)
SZ = (H * W) // 2
K_w = max(-(-int(SZ * 0.5) // 128) * 128, 128)
flat_idx, ok_k = jax.jit(lambda w_: _band_compact(w_, K_w))(
    pk(weak == PixelState.WEAK))
gidx = jnp.minimum(flat_idx, SZ - 1)
af_k = jax.block_until_ready(jax.jit(lambda pl_, sv: anchor_fields_at(
    ctx_yzl, anchors, sv, ref_img, dyn.sigma_color, pk, gidx))(plane, sel))
ref_c_k = pk(ref_img).reshape(-1)[gidx]
tw = timeit("gather_tap_words (x6)", lambda: gather_tap_words(
    tf, af_k, ref_c_k, dyn.sigma_color, W, 2), calls=6)

if backend == "pallas" and not FULL_ONLY:
    from dvpmvs.kernels.anchor_pallas import anchor_slot_costs_from_ctx
    slot_planes = jnp.broadcast_to(pk(plane)[None], (10, H, W // 2, 4))
    pl_k = slot_planes.reshape(10, SZ, 4)[:, gidx]
    timeit(f"anchor kernel x10 taps=1 (K={K_w})",
           lambda p10: anchor_slot_costs_from_ctx(ctx_yzl, p10, af_k,
                                                  ok_k=ok_k),
           pl_k, calls=6)
    timeit(f"anchor kernel x10 taps=3 (K={K_w})",
           lambda p10, t_: anchor_slot_costs_from_ctx(
               ctx_yzl, p10, af_k, ok_k=ok_k, tap_words=t_),
           pl_k, tw, calls=6)

# full REFINE_ITER pass at both tap settings
src_depths = jnp.asarray(scene.gt_depth[reps])
n_world = jnp.einsum("ji,hwj->hwi", ref_cam.R, jnp.asarray(scene.gt_normal[0]))
init_world = jnp.concatenate([n_world, (d0 * 1.01)[..., None]], -1)
for taps in (1, 3):
    static_r = PMStatic(state=RunState.REFINE_ITER, num_src=V,
                        max_iterations=3, cost_backend=backend,
                        use_APD=True, geom_consistency=True,
                        use_edge=False, use_label=False, anchor_taps=taps)
    f = jax.jit(lambda *a: run_pass(*a, static=static_r, dyn=dyn, key=key,
                                    init_plane_world=init_world,
                                    init_sel_views=sel, init_weak=weak,
                                    src_depths=src_depths))
    t0 = time.time()
    out = jax.block_until_ready(f(ref_img, src_imgs, ref_cam, src_cams))
    dt_c = time.time() - t0
    t0 = time.time()
    for _ in range(2):
        out = f(ref_img, src_imgs, ref_cam, src_cams)
    jax.block_until_ready(out.depth)
    gt = scene.gt_depth[0]
    d = np.asarray(out.depth)[8:-8, 8:-8]
    rel = np.abs(d - gt[8:-8, 8:-8]) / np.maximum(gt[8:-8, 8:-8], 1e-6)
    acc = float(((rel < 0.02) & (d > 0)).mean())
    print(f"REFINE_ITER full pass anchor_taps={taps}: "
          f"{(time.time()-t0)/2:.2f} s  acc2%={acc:.3f} "
          f"(compile {dt_c:.0f} s)", flush=True)
