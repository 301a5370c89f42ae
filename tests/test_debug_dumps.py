"""Per-pixel debug dumps: the reference's DEBUG_COST_LINE / DEBUG_NEIGHBOUR
compile-time buffers (APD.cu:3990-3997, 4455-4470, 4507-4524) as a runtime
flag (PMStatic.debug_dumps + CLI --debug-dumps)."""

import struct

import numpy as np
import jax
import jax.numpy as jnp

from dvpmvs.config import PMDynamic, PMStatic, RunState
from dvpmvs.engine import run_pass
from dvpmvs.geometry import stack_cameras
from dvpmvs.io.dmb import read_bin_mat
from dvpmvs.utils.synthetic import make_scene


def test_debug_dump_writer_formats(tmp_path):
    """The runner writes the three reference-layout files from PassOutput."""
    from dvpmvs.engine.state import PassOutput
    from dvpmvs.sched.runner import SceneRunner

    H, W, A = 6, 8, 3
    rng = np.random.default_rng(0)
    curve = rng.uniform(0, 2, (61, H, W)).astype(np.float32)
    axy = rng.integers(0, 6, (A, H, W, 2)).astype(np.int32)
    av = rng.uniform(size=(A, H, W)) < 0.4
    out = PassOutput(
        depth=jnp.zeros((H, W)), normal_world=jnp.zeros((H, W, 3)),
        cost=jnp.zeros((H, W)), weak=jnp.zeros((H, W), jnp.int8),
        sel_views=jnp.zeros((H, W, 2), bool),
        view_weights=jnp.zeros((H, W, 2)), radius=jnp.zeros((H, W)),
        cost_line=jnp.asarray(curve), anchors_xy=jnp.asarray(axy),
        anchors_valid=jnp.asarray(av))

    class P:
        result_folder = tmp_path / "00000000"

    SceneRunner._write_debug_dumps(None, P, out)

    raw = (P.result_folder / "weak_ncc_cost.bin").read_bytes()
    w, h, n = struct.unpack("<3i", raw[:12])
    assert (w, h, n) == (W, H, 61)
    got = np.frombuffer(raw[12:], np.float32).reshape(H, W, 61)
    np.testing.assert_allclose(got, np.moveaxis(curve, 0, -1))

    nmap = read_bin_mat(P.result_folder / "neighbour_map.bin")
    has = av.any(0)
    assert ((nmap >= 0) == has).all()
    raw = (P.result_folder / "neighbour.bin").read_bytes()
    wc, num = struct.unpack("<2i", raw[:8])
    assert wc == int(has.sum()) and num == A + 1
    ent = np.frombuffer(raw[8:], np.int16).reshape(wc, A + 1, 2)
    ys, xs = np.nonzero(has)
    np.testing.assert_array_equal(ent[:, 0, 0], xs)   # first = pixel itself
    np.testing.assert_array_equal(ent[:, 0, 1], ys)
    k = wc // 2
    for a in range(A):
        if av[a, ys[k], xs[k]]:
            np.testing.assert_array_equal(ent[k, 1 + a], axy[a, ys[k], xs[k]])
        else:
            assert (ent[k, 1 + a] == -1).all()


def test_debug_dumps_cost_line_from_pass():
    """debug_dumps threads the sweep cost curves out of run_pass; the curve
    minimum sits near the solved depth's disparity step."""
    scene = make_scene(num_views=3, height=24, width=32, seed=3)
    static = PMStatic(state=RunState.FIRST_INIT, num_src=2, max_iterations=1,
                      cost_backend="exact", debug_dumps=True)
    dyn = PMDynamic.create(depth_min=float(scene.cameras[0].depth_min),
                           depth_max=float(scene.cameras[0].depth_max))
    out = jax.jit(lambda *a: run_pass(*a, static=static, dyn=dyn,
                                      key=jax.random.PRNGKey(0)))(
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[[1, 2]]),
        scene.cameras[0], stack_cameras([scene.cameras[1], scene.cameras[2]]))
    assert out.cost_line is not None and out.cost_line.shape == (61, 24, 32)
    cl = np.asarray(out.cost_line)
    assert np.isfinite(cl).all() and cl.min() >= 0 and cl.max() <= 2.0
    # center step (k=0) evaluates the pass's own depth: it must be a
    # near-minimum of the curve for well-solved interior pixels
    interior = cl[:, 8:-8, 8:-8]
    frac_center_best = (interior.argmin(axis=0) == 30).mean()
    assert frac_center_best > 0.2
