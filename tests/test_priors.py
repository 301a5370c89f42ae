"""Priors tests: edges/labels, mono alignment, Depth-Anything forward."""

import jax
import numpy as np
import pytest

from dvpmvs.priors.edges import (canny, connected_components, edge_segment,
                                 roberts)
from dvpmvs.priors.mono import (align_mono_depth, mono_prior_planes,
                                normals_from_depth)
from dvpmvs.utils.synthetic import make_scene


def test_roberts_flat_vs_edge():
    img = np.zeros((20, 20), np.float32)
    img[:, 10:] = 100.0
    g = roberts(img)
    assert g[5, 9] > 50.0           # at the step
    assert g[5, 3] == 0.0           # flat region
    assert g[0, 19] == pytest.approx(50.0 * np.sqrt(2.0))  # border value


def test_canny_detects_step_edge():
    img = np.zeros((32, 32), np.float32)
    img[:, 16:] = 200.0
    e = canny(img, 20, 60)
    assert e[10, 15:17].max() == 255
    assert e[10, 5] == 0


def test_connected_components_counts():
    edge = np.zeros((10, 10), np.uint8)
    edge[:, 4] = 255                 # vertical edge splits two regions
    lab, cnt = connected_components(edge)
    labels = {lab[0, 0], lab[0, 9]}
    assert 0 not in labels and len(labels) == 2
    assert cnt[lab[0, 0]] == 40      # 10 x 4 left region
    assert cnt[lab[0, 9]] == 50      # 10 x 5 right region


def test_edge_segment_modes():
    scene = make_scene(num_views=1, height=96, width=128, seed=6)
    img = scene.images[0]
    e = edge_segment(0, img, mode=0, use_canny=True)
    assert e.shape == img.shape and set(np.unique(e)) <= {0, 255}
    lab = edge_segment(0, img, mode=1, use_canny=False)
    assert lab.shape == img.shape and lab.dtype == np.int32


def test_mono_alignment_recovers_scale():
    scene = make_scene(num_views=2, height=48, width=64, seed=7)
    cam = scene.cameras[0]
    gt = scene.gt_depth[0].astype(np.float64)
    # fake mono map: 255 - s*gt (so inversion recovers s*gt)
    s = 30.0
    mono = 255.0 - s * gt
    # sparse points: subsample GT backprojections
    H, W = gt.shape
    ys, xs = np.mgrid[4:H:8, 4:W:8]
    from dvpmvs.geometry.transforms import backproject_cam, cam_to_world
    import jax.numpy as jnp
    Xw = np.asarray(cam_to_world(backproject_cam(
        jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32),
        jnp.asarray(gt[ys, xs], jnp.float32), cam), cam))
    aligned = align_mono_depth(mono, np.stack([xs.ravel(), ys.ravel()], -1),
                               Xw.reshape(-1, 3), cam)
    rel = np.abs(aligned - gt) / gt
    assert np.median(rel[8:-8, 8:-8]) < 0.02


def test_normals_from_depth_plane():
    scene = make_scene(num_views=1, height=48, width=64, seed=8)
    cam = scene.cameras[0]
    n = normals_from_depth(scene.gt_depth[0], cam, to_world=False)
    dots = np.sum(n[8:-8, 8:-8] * scene.gt_normal[0][8:-8, 8:-8], axis=-1)
    assert np.mean(dots > 0.95) > 0.8


def test_depth_anything_forward():
    from dvpmvs.priors.depth_anything import (DAConfig, infer_relative_depth,
                                              init_params)
    cfg = DAConfig.tiny_test()
    params = init_params(jax.random.PRNGKey(0), cfg, hw=(42, 56))
    img = np.random.default_rng(0).uniform(0, 255, (40, 52)).astype(np.float32)
    out = infer_relative_depth(params, img, cfg)
    assert out.shape == (40, 52)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 255.0
