"""View-sharding scaling bench: batched pass throughput at 1 vs N devices.

Runs the PRODUCTION batched pass (SceneRunner.run_pass_batched path:
make_batched_pass over a `views` mesh) on a synthetic multi-view scene and
reports view-passes/sec at mesh sizes 1 and N, plus scaling efficiency.
On CPU use:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py [H W iters mode]
mode: "first" (FIRST_INIT photometric) or "refine" (REFINE_ITER with full
weak machinery + geometric consistency — the production geometric pass).
Results are recorded in BASELINE.md.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dvpmvs.config import PMDynamic, PMStatic, PixelState, RunState
from dvpmvs.dist.mesh import make_mesh
from dvpmvs.dist.sharding import make_batched_pass, shard_problems
from dvpmvs.geometry import stack_cameras
from dvpmvs.utils.synthetic import make_scene

H, W, ITERS = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (
    96, 128, 2)
MODE = sys.argv[4] if len(sys.argv) > 4 else "first"
N = len(jax.devices())
B = N                          # one problem per device at full mesh
V = 3

scene = make_scene(num_views=max(B, V + 1), height=H, width=W, seed=7)
backend = "exact" if jax.default_backend() == "cpu" else "pallas"
if MODE == "refine":
    # the round-0 geometric pass (REFINE_ITER, geom_consistency, use_APD
    # off — round_pass_params sets use_APD=(round>0)); the full-APD
    # variant's 8-problem XLA CPU compile exceeds 80 min on this box
    static = PMStatic(state=RunState.REFINE_ITER, num_src=V,
                      max_iterations=ITERS, cost_backend=backend,
                      use_APD=False, geom_consistency=True,
                      use_edge=False, use_label=False, extend_rounds=0)
else:
    static = PMStatic(state=RunState.FIRST_INIT, num_src=V,
                      max_iterations=ITERS, cost_backend=backend,
                      use_edge=False, extend_rounds=0)

ref_ids = list(range(B))
src_ids = np.asarray([[v for v in range(len(scene.cameras)) if v != r][:V]
                      for r in ref_ids])
ref_imgs = jnp.asarray(scene.images[ref_ids])
src_imgs = jnp.asarray(np.stack([scene.images[s] for s in src_ids]))
ref_cams = jax.tree.map(lambda *xs: jnp.stack(xs),
                        *[scene.cameras[r] for r in ref_ids])
src_cams = jax.tree.map(
    lambda *xs: jnp.stack(xs),
    *[stack_cameras([scene.cameras[v] for v in s]) for s in src_ids])
dyns = jax.vmap(lambda lo, hi: PMDynamic.create(depth_min=lo, depth_max=hi)
                )(ref_cams.depth_min, ref_cams.depth_max)
keys = jax.random.split(jax.random.PRNGKey(0), B)
args = (ref_imgs, src_imgs, ref_cams, src_cams, dyns, keys)
kw = {}
if MODE == "refine":
    rng = np.random.default_rng(0)
    ipw, iw = [], []
    for r in ref_ids:
        nw = np.einsum("ji,hwj->hwi", np.asarray(scene.cameras[r].R),
                       scene.gt_normal[r])
        d = scene.gt_depth[r] * 1.01
        ipw.append(np.concatenate([nw, d[..., None]], -1))
        iw.append(np.where(rng.uniform(size=(H, W)) < 0.3,
                           PixelState.WEAK,
                           PixelState.STRONG).astype(np.int8))
    kw["init_plane_world"] = jnp.asarray(np.stack(ipw).astype(np.float32))
    kw["init_sel"] = jnp.ones((B, H, W, V), bool)
    kw["init_weak"] = jnp.asarray(np.stack(iw))
    kw["src_depths"] = jnp.asarray(
        np.stack([scene.gt_depth[s] for s in src_ids]).astype(np.float32))


def bench(n_dev):
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    fn = make_batched_pass(static, mesh)
    a = shard_problems(args, mesh) if mesh is not None else args
    k = ({key: shard_problems(v, mesh) for key, v in kw.items()}
         if mesh is not None else kw)
    t0 = time.time()
    out = fn(*a, **k)
    out.depth.block_until_ready()
    print(f"  mesh={n_dev}: compile+first {time.time() - t0:.0f}s",
          flush=True)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = fn(*a, **k)
    out.depth.block_until_ready()
    dt = (time.time() - t0) / reps
    return B / dt              # view-passes/sec


vps1 = bench(1)
vpsN = bench(N)
eff = vpsN / (vps1 * N)
print(f"B={B} problems {H}x{W} V={V} iters={ITERS} mode={MODE} "
      f"backend={backend}")
print(f"mesh=1: {vps1:.3f} view-pass/s   mesh={N}: {vpsN:.3f} view-pass/s")
print(f"scaling efficiency vs linear: {eff:.2f}")
