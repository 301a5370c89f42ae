"""Weak-pixel machinery unit tests (vs brute-force numpy oracles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvpmvs.config import PixelState
from dvpmvs.geometry import Camera, dist_to_origin
from dvpmvs.kernels.weak import (
    _RAY_DIRS, edge_ray_distance, label_boundary_distance, nearest_strong,
    patch_candidates, find_anchors, ransac_fit_plane, edge_complexity,
    NUM_ANCHORS, _BIG,
)
from dvpmvs.utils.synthetic import make_scene


def _brute_ray_dist(mask, dx, dy):
    H, W = mask.shape
    out = np.full((H, W), _BIG)
    for y in range(H):
        for x in range(W):
            k = 1
            while True:
                nx, ny = x + k * dx, y + k * dy
                if nx < 0 or nx >= W or ny < 0 or ny >= H:
                    break
                if mask[ny, nx]:
                    out[y, x] = k * np.hypot(dx, dy)
                    break
                k += 1
    return out


def test_edge_ray_distance_vs_bruteforce():
    rng = np.random.default_rng(0)
    edge = rng.random((24, 40)) < 0.07
    dists = np.asarray(edge_ray_distance(jnp.asarray(edge)))
    for i, (dx, dy) in enumerate(_RAY_DIRS):
        exp = _brute_ray_dist(edge, dx, dy)
        got = dists[i]
        both_inf = (exp >= _BIG) & (got >= _BIG)
        np.testing.assert_allclose(np.where(both_inf, 0, got),
                                   np.where(both_inf, 0, exp),
                                   atol=1e-3, err_msg=f"dir {(dx, dy)}")


def test_label_boundary_distance_simple():
    label = np.ones((16, 16), np.int32)
    label[:, 8:] = 2
    d = np.asarray(label_boundary_distance(jnp.asarray(label)))
    # direction right (index 3): pixel (y, 5) has first change 2 steps away
    # (label[7]!=label[8] -> change flag at x=7 -> dist from x=5 is 2)
    assert d[3][5, 5] == pytest.approx(2.0)
    assert d[2][5, 10] == pytest.approx(2.0)   # left from x=10: change at 8


def test_nearest_strong():
    weak = np.full((32, 32), PixelState.WEAK, np.int8)
    weak[4, 6] = PixelState.STRONG
    weak[20, 25] = PixelState.STRONG
    coords, valid = nearest_strong(jnp.asarray(weak))
    coords = np.asarray(coords)
    assert bool(valid[10, 8])
    np.testing.assert_array_equal(coords[4, 6], [6, 4])
    np.testing.assert_array_equal(coords[5, 7], [6, 4])
    np.testing.assert_array_equal(coords[21, 24], [25, 20])
    # midpoint-ish pixels pick the closer seed
    assert tuple(coords[18, 22]) == (25, 20)


def test_edge_complexity_range():
    edge = np.zeros((20, 20), bool)
    edge[8:12, :] = True
    c = np.asarray(edge_complexity(jnp.asarray(edge)))
    assert c.min() >= 0.0 and c.max() <= 1.0
    assert c[10, 10] > c[0, 0]


def test_patch_candidates_shapes_and_visibility():
    scene = make_scene(num_views=3, height=24, width=32, seed=0)
    ref_img = jnp.asarray(scene.images[0])
    H, W = ref_img.shape
    sel = np.zeros((H, W, 2), bool)
    sel[:, :16, 0] = True          # view 0 visible on the left half only
    sel[:, :, 1] = True
    cands = np.asarray(patch_candidates(ref_img, jnp.asarray(sel), 3.0))
    assert cands.shape == (2, 8, H, W, 2)
    # view 1 fully visible: interior pixels get 8 non-empty offsets
    nz = np.any(cands[1, :, 12, 16] != 0, axis=-1)
    assert nz.sum() >= 7
    # view 0 in the far right: no visible neighbors -> all-empty (0,0)
    assert np.all(cands[0, :, 12, 30] == 0)


@pytest.fixture(scope="module")
def weak_scene():
    scene = make_scene(num_views=4, height=64, width=80, seed=3,
                       weak_disc=True)
    return scene


def test_anchor_generation(weak_scene):
    scene = weak_scene
    ref = scene.cameras[0]
    H, W = scene.images[0].shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    n = jnp.asarray(scene.gt_normal[0])
    d = jnp.asarray(scene.gt_depth[0])
    w = dist_to_origin(n, xs, ys, d, ref)
    plane = jnp.concatenate([n, w[..., None]], -1)

    # mark a disc weak, rest strong
    weak = np.full((H, W), PixelState.STRONG, np.int8)
    yy, xx = np.mgrid[0:H, 0:W]
    disc = (yy - 32) ** 2 + (xx - 40) ** 2 < 14 ** 2
    weak[disc] = PixelState.WEAK
    weak = jnp.asarray(weak)

    res = find_anchors(weak, plane, ref, jax.random.PRNGKey(0),
                       rotate_time=2, depth_range=float(
                           ref.depth_max - ref.depth_min))
    assert res.coords.shape == (NUM_ANCHORS, H, W, 2)
    # center of the disc: anchors exist, are strong pixels, and reliable
    cx, cy = 40, 32
    assert bool(res.reliable[cy, cx])
    coords = np.asarray(res.coords[:, cy, cx])
    valid = np.asarray(res.valid[:, cy, cx])
    assert valid.sum() >= 6
    weak_np = np.asarray(weak)
    for (ax, ay), ok in zip(coords, valid):
        if ok:
            assert weak_np[ay, ax] == PixelState.STRONG

    # fit plane at the disc center approximates the GT depth
    fit4, radius = ransac_fit_plane(
        res, plane, weak, ref, jax.random.PRNGKey(1), use_radius=True,
        edge_dist=None, label_dist=None)
    fit4 = np.asarray(fit4)
    assert np.any(fit4[cy, cx, :3] != 0)
    rx = (cx - float(ref.cx)) / float(ref.fx)
    ry = (cy - float(ref.cy)) / float(ref.fy)
    denom = fit4[cy, cx, 0] * rx + fit4[cy, cx, 1] * ry + fit4[cy, cx, 2]
    fit_depth = -fit4[cy, cx, 3] / denom
    gt = scene.gt_depth[0][cy, cx]
    assert abs(fit_depth - gt) / gt < 0.05, (fit_depth, gt)
    assert radius is not None and radius.shape == (H, W)
