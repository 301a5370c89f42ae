"""COLMAP converter + CLI + viz + native labeler tests."""

import numpy as np
import pytest

from dvpmvs.io.colmap import (ColmapCamera, ColmapImage, ColmapPoint3D,
                              convert_colmap, qvec2rotmat, read_model,
                              view_selection_scores, depth_range_for)
from dvpmvs.io import read_cam_txt, read_pair_txt


def _write_text_model(model_dir, n_views=3, n_pts=60, seed=0):
    rng = np.random.default_rng(seed)
    model_dir.mkdir(parents=True, exist_ok=True)
    (model_dir / "cameras.txt").write_text(
        "# cameras\n1 PINHOLE 64 48 60.0 60.0 32.0 24.0\n")
    pts = rng.uniform([-1, -1, 3], [1, 1, 5], size=(n_pts, 3))
    img_lines = []
    pt_tracks = {i: [] for i in range(n_pts)}
    for v in range(n_views):
        ang = (v - 1) * 0.1
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        # qvec from R
        tr = np.trace(R)
        qw = np.sqrt(max(1 + tr, 0)) / 2
        qx = (R[2, 1] - R[1, 2]) / (4 * qw)
        qy = (R[0, 2] - R[2, 0]) / (4 * qw)
        qz = (R[1, 0] - R[0, 1]) / (4 * qw)
        t = np.array([0.1 * v, 0.0, 0.0])
        obs = []
        for pi in range(n_pts):
            xc = R @ pts[pi] + t
            x = xc[0] / xc[2] * 60 + 32
            y = xc[1] / xc[2] * 60 + 24
            if 0 <= x < 64 and 0 <= y < 48:
                obs.append((x, y, pi + 1))
                pt_tracks[pi].append(v + 1)
        img_lines.append(f"{v+1} {qw} {qx} {qy} {qz} {t[0]} {t[1]} {t[2]} 1 "
                         f"im{v}.png")
        img_lines.append(" ".join(f"{x} {y} {pid}" for x, y, pid in obs))
    (model_dir / "images.txt").write_text("\n".join(img_lines) + "\n")
    pt_lines = []
    for pi in range(n_pts):
        track = " ".join(f"{iid} 0" for iid in pt_tracks[pi])
        pt_lines.append(f"{pi+1} {pts[pi,0]} {pts[pi,1]} {pts[pi,2]} "
                        f"100 120 140 0.5 {track}")
    (model_dir / "points3D.txt").write_text("\n".join(pt_lines) + "\n")
    return pts


def test_qvec_identity():
    np.testing.assert_allclose(qvec2rotmat(np.array([1.0, 0, 0, 0])),
                               np.eye(3), atol=1e-12)


def test_convert_colmap_roundtrip(tmp_path):
    dense = tmp_path / "dense"
    _write_text_model(dense / "sparse")
    save = tmp_path / "out"
    convert_colmap(dense, save, scale_factor=1, write_images=False)

    pairs = read_pair_txt(save / "pair.txt")
    assert len(pairs) == 3
    assert all(len(srcs) >= 1 for _, srcs in pairs)
    cam = read_cam_txt(save / "cams" / "00000000_cam.txt")
    assert float(cam.depth_min) > 0
    assert float(cam.depth_max) > float(cam.depth_min)
    np.testing.assert_allclose(np.asarray(cam.K)[0, 0], 60.0, rtol=1e-6)
    # sfm files exist for the mono prior
    rows = (save / "sfm" / "00000000.txt").read_text().strip().splitlines()
    assert len(rows) > 10


def test_view_selection_zero_for_tiny_angle(tmp_path):
    # two nearly-identical cameras share points but triangulate < 1 degree
    cams, imgs, pts = read_model(
        _write_and_load_degenerate(tmp_path / "m"), ext=".txt")
    s = view_selection_scores(imgs, pts)
    assert s[0, 1] == 0.0


def _write_and_load_degenerate(model_dir):
    model_dir.mkdir(parents=True, exist_ok=True)
    (model_dir / "cameras.txt").write_text(
        "1 PINHOLE 64 48 60.0 60.0 32.0 24.0\n")
    lines = []
    for v in range(2):
        t = np.array([1e-5 * v, 0, 0])        # ~zero baseline
        lines.append(f"{v+1} 1 0 0 0 {t[0]} {t[1]} {t[2]} 1 im{v}.png")
        lines.append(" ".join(f"{10+i} {10+i} {i+1}" for i in range(8)))
    (model_dir / "images.txt").write_text("\n".join(lines) + "\n")
    pt_lines = []
    for i in range(8):
        pt_lines.append(f"{i+1} 0.1 0.1 4.0 1 2 3 0.1 1 0 2 0")
    (model_dir / "points3D.txt").write_text("\n".join(pt_lines) + "\n")
    return model_dir


def test_cli_synth_and_viz(tmp_path):
    from dvpmvs.cli.run import main
    rc = main(["synth", str(tmp_path / "sc"), "--views", "2",
               "--height", "32", "--width", "40"])
    assert rc == 0
    assert (tmp_path / "sc" / "pair.txt").exists()

    from dvpmvs.utils.viz import (write_depth_viz, write_normal_viz,
                                  write_weak_viz)
    d = np.random.default_rng(0).uniform(1, 5, (16, 20)).astype(np.float32)
    write_depth_viz(tmp_path / "d.png", d, 1.0, 5.0)
    write_normal_viz(tmp_path / "n.png",
                     np.zeros((16, 20, 3), np.float32))
    write_weak_viz(tmp_path / "w.png", np.zeros((16, 20), np.int8))
    assert (tmp_path / "d.png").exists()


def test_native_labeler_matches_scipy():
    pytest.importorskip("scipy")
    from dvpmvs.priors.labeling_native import label
    from scipy import ndimage
    rng = np.random.default_rng(3)
    zero = rng.random((40, 56)) < 0.55
    try:
        lab, cnt = label(zero)
    except Exception:
        pytest.skip("native lib unavailable")
    s = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], int)
    lab2, n2 = ndimage.label(zero, structure=s)
    assert cnt.shape[0] - 1 == n2
    cnt2 = np.bincount(lab2.ravel())
    cnt2[0] = 0
    assert sorted(cnt[1:].tolist()) == sorted(cnt2[1:].tolist())
