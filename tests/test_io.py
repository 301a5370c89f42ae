"""I/O round-trip tests for the reference-compatible binary formats."""

import numpy as np
import pytest

from dvpmvs.io import (
    read_bin_mat, write_bin_mat, read_dmb, write_depth_dmb, write_normal_dmb,
    read_cam_txt, write_cam_txt, read_pair_txt, write_pair_txt,
    write_ply, read_ply, load_scene,
)
from dvpmvs.utils.synthetic import make_scene, write_scene_dir


@pytest.mark.parametrize("dtype,channels", [
    (np.float32, 1), (np.uint8, 1), (np.int32, 1), (np.float32, 3),
])
def test_bin_mat_roundtrip(tmp_path, dtype, channels):
    rng = np.random.default_rng(0)
    shape = (17, 23) if channels == 1 else (17, 23, channels)
    if np.issubdtype(dtype, np.floating):
        arr = rng.standard_normal(shape).astype(dtype)
    else:
        arr = rng.integers(0, 100, size=shape).astype(dtype)
    p = tmp_path / "m.bin"
    write_bin_mat(p, arr)
    back = read_bin_mat(p)
    np.testing.assert_array_equal(back, arr)


def test_bin_mat_header_layout(tmp_path):
    """Header must be int32 [1, rows, cols, cv_type] (APD.cpp:630-649)."""
    arr = np.zeros((4, 6), np.float32)
    p = tmp_path / "m.bin"
    write_bin_mat(p, arr)
    hdr = np.fromfile(p, dtype=np.int32, count=4)
    assert list(hdr) == [1, 4, 6, 5]          # CV_32FC1 == 5
    arr3 = np.zeros((4, 6, 3), np.float32)
    write_bin_mat(p, arr3)
    hdr = np.fromfile(p, dtype=np.int32, count=4)
    assert list(hdr) == [1, 4, 6, 21]         # CV_32FC3 == 21


def test_dmb_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    d = rng.standard_normal((9, 11)).astype(np.float32)
    n = rng.standard_normal((9, 11, 3)).astype(np.float32)
    write_depth_dmb(tmp_path / "d.dmb", d)
    write_normal_dmb(tmp_path / "n.dmb", n)
    np.testing.assert_array_equal(read_dmb(tmp_path / "d.dmb"), d)
    np.testing.assert_array_equal(read_dmb(tmp_path / "n.dmb"), n)
    hdr = np.fromfile(tmp_path / "d.dmb", dtype=np.int32, count=4)
    assert list(hdr) == [1, 9, 11, 1]


def test_cam_txt_roundtrip(tmp_path):
    scene = make_scene(num_views=1, height=32, width=32)
    cam = scene.cameras[0]
    p = tmp_path / "cam.txt"
    write_cam_txt(p, cam)
    cam2 = read_cam_txt(p)
    np.testing.assert_allclose(cam2.K, cam.K, rtol=1e-5)
    np.testing.assert_allclose(cam2.R, cam.R, rtol=1e-5)
    np.testing.assert_allclose(cam2.t, cam.t, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cam2.c, cam.c, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(cam2.depth_min), float(cam.depth_min), rtol=1e-5)


def test_pair_txt_roundtrip_and_score_filter(tmp_path):
    pairs = [(0, [(1, 10.0), (2, 5.0)]), (1, [(0, 10.0)]), (2, [(0, 5.0), (1, 0.0)])]
    p = tmp_path / "pair.txt"
    write_pair_txt(p, pairs)
    back = read_pair_txt(p)
    # zero-score src views are dropped (main.cpp:160-163)
    assert back[0] == (0, [(1, 10.0), (2, 5.0)])
    assert back[2] == (2, [(0, 5.0)])
    back_all = read_pair_txt(p, drop_nonpositive=False)
    assert back_all[2] == (2, [(0, 5.0), (1, 0.0)])


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    p = tmp_path / "c.ply"
    write_ply(p, pts, cols)
    pts2, cols2 = read_ply(p)
    np.testing.assert_array_equal(pts2, pts)
    np.testing.assert_array_equal(cols2, cols)


def test_scene_dir_roundtrip(tmp_path):
    scene = make_scene(num_views=3, height=40, width=56, seed=5)
    folder = write_scene_dir(scene, tmp_path / "scene")
    loaded = load_scene(folder)
    assert loaded.num_views == 3
    assert loaded.problems[0].src_image_ids == [1, 2]
    np.testing.assert_allclose(loaded.images[1], scene.images[1], atol=1e-4)
    np.testing.assert_allclose(loaded.cameras[2].K, scene.cameras[2].K, rtol=1e-5)


def test_mvs4_label_ingestion(tmp_path):
    """External MVS4/%08d.dmb label maps are preferred over self-computed
    labels and rescaled to the image extent (APD.cpp:1634-1645)."""
    from dvpmvs.io.dmb import write_depth_dmb
    from dvpmvs.sched.runner import SceneRunner

    scene = make_scene(num_views=3, height=40, width=56, seed=5)
    folder = write_scene_dir(scene, tmp_path / "scene")
    loaded = load_scene(folder)

    mvs4 = folder / "MVS4"
    mvs4.mkdir()
    lab = np.arange(20 * 28, dtype=np.float32).reshape(20, 28)  # half size
    write_depth_dmb(mvs4 / "00000000.dmb", lab)

    runner = SceneRunner(loaded, verbose=False)
    _, got = runner._edges_for(0, scale_size=1, need_label=True)
    assert got.dtype == np.int32 and got.shape == (40, 56)
    # nearest rescale of the file content, not a self-computed label map
    assert got[0, 0] == 0 and got[-1, -1] == int(lab[-1, -1])
    assert len(np.unique(got)) > 100   # self-computed maps have few labels

    # fallback: a view with no file self-computes (mode-1 edge_segment)
    _, fb = runner._edges_for(1, scale_size=1, need_label=True)
    assert fb is not None and fb.shape == (40, 56)
    assert len(np.unique(fb)) < 100
