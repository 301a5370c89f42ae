"""Phase-B distribution: spatial (tile) sharding of one large view.

SURVEY §7.7: when a single image is too large for one chip (or view count <
chip count), the [H, W] state shards across a ``tile`` mesh axis.  The
reference has no analogue — it processes one view on one GPU.

Design (TPU-first): rather than hand-writing halo exchanges, the whole pass
is expressed as dense jnp ops over the full logical [H, W] arrays and jitted
with ``in_shardings``/``out_shardings`` that split the row axis across the
mesh.  XLA's SPMD partitioner propagates the sharding through the program
and inserts the minimal collectives itself:

  * window ops (NCC sums, median filter, checkerboard reads) become
    halo exchanges (collective-permute of boundary rows over ICI);
  * the rare global reads (anchor gathers at arbitrary coords, edge rays)
    become all-gathers of the single [H, W] plane array — a few MB, once per
    candidate batch, riding ICI.

This follows the scaling-book recipe: pick a mesh, annotate shardings at the
jit boundary, let XLA insert collectives — no manual ring code.  The
checkerboard semantics are unchanged (dense masked updates are
partition-oblivious), so tiled and untiled passes compute the same result up
to float reassociation; ``tests/test_dist.py`` asserts equality on the CPU
mesh.

Interplay with Phase A: the two compose as a 2-D ``(views, tile)`` mesh —
problems shard over ``views``, rows over ``tile`` (``make_mesh2``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PMDynamic, PMStatic
from ..engine.patchmatch import run_pass
from ..engine.state import PassOutput


def make_mesh2(n_views: int, n_tiles: int,
               devices=None) -> Mesh:
    """A (views, tile) mesh: problems over axis 0, image rows over axis 1."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    need = n_views * n_tiles
    if devs.size < need:
        raise ValueError(f"need {need} devices, have {devs.size}")
    return Mesh(devs[:need].reshape(n_views, n_tiles), ("views", "tile"))


def _row_sharded_specs(static: PMStatic, mesh: Mesh, axis: str):
    """PartitionSpecs for run_pass's positional+keyword args and output.

    [H, W]-leading arrays split rows over ``axis``; cameras/scalars/keys
    replicate.  Source images/depths are [V, H, W] — rows are axis 1.
    """
    row = P(axis, None)                    # [H, W]
    vrow = P(None, axis, None)             # [V, H, W]
    rep = P()
    arg_specs = dict(
        ref_img=row, src_imgs=vrow, ref_cam=rep, src_cams=rep,
        dyn=rep, key=rep,
        init_plane_world=P(axis, None, None), init_sel_views=P(axis, None, None),
        init_weak=row, src_depths=vrow, radius_map=row, edge=row, label=row)
    out_specs = PassOutput(
        depth=row, normal_world=P(axis, None, None), cost=row,
        weak=row, sel_views=P(axis, None, None),
        view_weights=P(axis, None, None), radius=row)
    return arg_specs, out_specs


def make_tiled_pass(static: PMStatic, mesh: Mesh, axis: str = "tile"):
    """jit-compiled run_pass with [H, W] state row-sharded over ``axis``.

    Returns fn(ref_img, src_imgs, ref_cam, src_cams, dyn, key, **optional)
    -> PassOutput with row-sharded leaves.  H must be divisible by the mesh
    axis size (the scene runner pads rounds to multiples of 8 anyway).
    """
    specs, out_specs = _row_sharded_specs(static, mesh, axis)

    def fn(ref_img, src_imgs, ref_cam, src_cams, dyn, key,
           init_plane_world=None, init_sel_views=None, init_weak=None,
           src_depths=None, radius_map=None, edge=None, label=None):
        return run_pass(
            ref_img, src_imgs, ref_cam, src_cams, static, dyn, key,
            init_plane_world=init_plane_world, init_sel_views=init_sel_views,
            init_weak=init_weak, src_depths=src_depths, radius_map=radius_map,
            edge=edge, label=label)

    def shardify(name):
        return NamedSharding(mesh, specs[name])

    in_shardings = (
        shardify("ref_img"), shardify("src_imgs"),
        NamedSharding(mesh, P()), NamedSharding(mesh, P()),
        NamedSharding(mesh, P()), NamedSharding(mesh, P()))
    kw_shardings = {k: shardify(k) for k in
                    ("init_plane_world", "init_sel_views", "init_weak",
                     "src_depths", "radius_map", "edge", "label")}
    out_sharding = jax.tree.map(lambda s: NamedSharding(mesh, s), out_specs)

    jitted = jax.jit(fn, out_shardings=out_sharding)

    def call(ref_img, src_imgs, ref_cam, src_cams, dyn, key, **kw):
        H = ref_img.shape[0]
        n = mesh.shape[axis]
        if H % n:
            raise ValueError(f"H={H} not divisible by tile axis {n}")
        args = [jax.device_put(a, s) for a, s in
                zip((ref_img, src_imgs), in_shardings[:2])]
        rep = NamedSharding(mesh, P())
        args += [jax.device_put(a, rep)
                 for a in (ref_cam, src_cams, dyn, key)]
        kws = {k: (jax.device_put(v, kw_shardings[k]) if v is not None
                   else None) for k, v in kw.items()}
        return jitted(*args, **kws)

    return call
