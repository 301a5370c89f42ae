"""Find a battery scene where DepthToWeak engages NATURALLY (VERDICT r4
weak-5): run FIRST_INIT on candidate textureless scenes and report how much
of the region DepthToWeak's own classification marks WEAK — no injection.

Usage: python scripts/tune_weak_scene.py   (forces the CPU backend)
"""
import os
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import uniform_filter

from dvpmvs.config import PMDynamic, PMStatic, PixelState, RunState
from dvpmvs.engine import run_pass
from dvpmvs.geometry import stack_cameras
from dvpmvs.utils.synthetic import make_scene

CANDS = [
    ("band 64x96", dict(num_views=4, height=64, width=96, seed=6,
                        weak_band=True)),
    ("band 96x128", dict(num_views=4, height=96, width=128, seed=6,
                         weak_band=True)),
    ("disc 96x128", dict(num_views=4, height=96, width=128, seed=4,
                         weak_disc=True)),
    ("band+noise 96x128", dict(num_views=4, height=96, width=128, seed=6,
                               weak_band=True, noise=4.0)),
]

for name, kw in CANDS:
    clean_kw = {k: v for k, v in kw.items() if k != "noise"}
    clean = make_scene(**clean_kw)
    img = clean.images[0]
    local_var = uniform_filter(img ** 2, 7) - uniform_filter(img, 7) ** 2
    region = local_var < 1.0
    m = 6
    region[:m] = region[-m:] = region[:, :m] = region[:, -m:] = False

    scene = make_scene(**kw)
    H, W = kw["height"], kw["width"]
    NV = kw["num_views"]
    src_ids = list(range(1, NV))
    ref_cam = scene.cameras[0]
    src_cams = stack_cameras([scene.cameras[i] for i in src_ids])
    dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min),
                           depth_max=float(ref_cam.depth_max))
    st0 = PMStatic(state=RunState.FIRST_INIT, num_src=NV - 1,
                   max_iterations=2, cost_backend="exact", rotate_time=2,
                   use_edge=False, use_label=False)
    out = jax.jit(lambda *a: run_pass(*a, static=st0, dyn=dyn,
                                      key=jax.random.PRNGKey(0)))(
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[src_ids]),
        ref_cam, src_cams)
    wk = np.asarray(out.weak)
    n_reg = int(region.sum())
    n_weak_in = int(((wk == PixelState.WEAK) & region).sum())
    n_weak_out = int(((wk == PixelState.WEAK) & ~region).sum())
    d = np.asarray(out.depth)
    rel = np.abs(d - scene.gt_depth[0]) / np.maximum(scene.gt_depth[0], 1e-6)
    acc_reg = float(((rel < 0.02) & (d > 0) & region).sum() / max(n_reg, 1))
    print(f"{name:20s} region={n_reg:5d}px  weak-in-region={n_weak_in:5d} "
          f"({n_weak_in / max(n_reg, 1):.2f})  weak-outside={n_weak_out:5d} "
          f"first-init acc2(region)={acc_reg:.3f}", flush=True)
