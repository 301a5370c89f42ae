"""Smoke-sized variants of the slow-marked parity gates (round-3 advisor:
the default run must catch regressions in the paths the slow suite gates —
tiled-vs-untiled, the weak engine, and the batched runner path).  Tiny
shapes keep compiles ~1 min; the full-size versions stay in `-m slow`."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvpmvs.config import PMDynamic, PMStatic, PixelState, RunState
from dvpmvs.engine import run_pass
from dvpmvs.geometry import stack_cameras
from dvpmvs.utils.synthetic import make_scene
from jax.sharding import Mesh

H, W, V = 16, 32, 2


def _problem(seed=3):
    scene = make_scene(num_views=V + 1, height=H, width=W, seed=seed)
    ref_cam = scene.cameras[0]
    src_ids = list(range(1, V + 1))
    src_cams = stack_cameras([scene.cameras[i] for i in src_ids])
    dyn = PMDynamic.create(depth_min=float(ref_cam.depth_min),
                           depth_max=float(ref_cam.depth_max))
    return scene, (jnp.asarray(scene.images[0]),
                   jnp.asarray(scene.images[src_ids]),
                   ref_cam, src_cams, dyn)


def test_tiled_pass_smoke():
    from dvpmvs.dist.tiles import make_tiled_pass

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs[:2]), ("tile",))
    static = PMStatic(state=RunState.FIRST_INIT, num_src=V,
                      max_iterations=1, cost_backend="exact")
    _, (ref_img, src_imgs, ref_cam, src_cams, dyn) = _problem()
    key = jax.random.PRNGKey(0)
    ref = run_pass(ref_img, src_imgs, ref_cam, src_cams, static, dyn, key)
    out = make_tiled_pass(static, mesh)(ref_img, src_imgs, ref_cam,
                                        src_cams, dyn, key)
    d1, d2 = np.asarray(ref.depth), np.asarray(out.depth)
    rel = np.abs(d1 - d2) / np.maximum(np.abs(d1), 1e-6)
    assert np.mean(rel > 1e-3) < 0.01


def test_weak_engine_smoke():
    """use_APD REFINE_INIT end-to-end at tiny shape: runs anchors, RANSAC
    fit planes, deformable slot costs and the weak compaction."""
    scene, (ref_img, src_imgs, ref_cam, src_cams, dyn) = _problem()
    static = PMStatic(state=RunState.REFINE_INIT, num_src=V,
                      max_iterations=1, cost_backend="exact", use_APD=True,
                      rotate_time=2, use_edge=False, use_label=False)
    rng = np.random.default_rng(0)
    n_w = np.einsum("ji,hwj->hwi", np.asarray(ref_cam.R),
                    scene.gt_normal[0])
    ipw = jnp.asarray(np.concatenate(
        [n_w, scene.gt_depth[0][..., None] * 1.05], -1))
    weak = jnp.asarray(np.where(rng.uniform(size=(H, W)) < 0.3,
                                PixelState.WEAK,
                                PixelState.STRONG).astype(np.int8))
    out = jax.jit(lambda *a: run_pass(
        *a, static=static, dyn=dyn, key=jax.random.PRNGKey(0),
        init_plane_world=ipw, init_sel_views=jnp.ones((H, W, V), bool),
        init_weak=weak))(ref_img, src_imgs, ref_cam, src_cams)
    d = np.asarray(out.depth)
    gt = scene.gt_depth[0]
    assert np.isfinite(d).all()
    m = 4
    rel = np.abs(d[m:-m, m:-m] - gt[m:-m, m:-m]) / gt[m:-m, m:-m]
    acc = float(((rel < 0.05) & (d[m:-m, m:-m] > 0)).mean())
    assert acc > 0.5, acc
