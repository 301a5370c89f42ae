"""Fused Pallas NCC kernel vs the exact XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvpmvs.geometry import stack_cameras
from dvpmvs.geometry.transforms import dist_to_origin
from dvpmvs.kernels.ncc import build_cost_context, ncc_cost
from dvpmvs.kernels.ncc_fused import fused_cost_from_ctx, pack_quads
from dvpmvs.utils.synthetic import make_scene


@pytest.fixture(scope="module")
def setup():
    H, W = 48, 160          # W deliberately not a multiple of 128
    scene = make_scene(num_views=3, height=H, width=W, seed=4)
    ref = scene.cameras[0]
    src_cams = stack_cameras(scene.cameras[1:])
    src_imgs = jnp.asarray(scene.images[1:])
    ctx_e = build_cost_context(jnp.asarray(scene.images[0]), src_imgs, ref,
                               src_cams, 5.0, 3.0, backend="exact")
    ctx_p = build_cost_context(jnp.asarray(scene.images[0]), src_imgs, ref,
                               src_cams, 5.0, 3.0, backend="pallas")
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    n = jnp.asarray(scene.gt_normal[0])
    d = jnp.asarray(scene.gt_depth[0])
    w = dist_to_origin(n, xs, ys, d, ref)
    plane = jnp.concatenate([n, w[..., None]], -1)
    return ctx_e, ctx_p, plane


def test_pack_quads_layout():
    img = jnp.arange(12.0).reshape(1, 3, 4)
    q = np.asarray(pack_quads(img))
    assert q[0, 0, 0] == 0 | (1 << 8) | (4 << 16) | (5 << 24)
    # edge clamping on last row/col
    assert q[0, 2, 3] == 11 | (11 << 8) | (11 << 16) | (11 << 24)


def test_fused_matches_exact_interpret(setup):
    ctx_e, ctx_p, plane = setup
    planes = jnp.stack([plane, plane.at[..., 3].mul(1.1),
                        plane.at[..., 3].mul(1.4)])
    ce = np.stack([np.asarray(ncc_cost(ctx_e, pl_)) for pl_ in planes])
    cp = np.asarray(fused_cost_from_ctx(ctx_p, planes, interpret=True))
    diff = np.abs(ce - cp)
    assert np.median(diff) < 0.01
    # uint8 quad quantization bounds the worst-case deviation
    assert (diff > 0.3).sum() == 0, diff.max()
