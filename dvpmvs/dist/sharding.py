"""View-parallel execution of PatchMatch passes.

Phase-A distribution (SURVEY §7.7): each ``Problem`` (reference view) is
independent within a pass, so a batch of problems shards across the mesh's
``views`` axis; between geometric passes the per-view depth maps are
exchanged (each problem reads its source views' depths — the reference's
cross-view synchronization point, APD.cpp:1147-1166).

All problems in a batch share (H, W, V) — the scene runner pads src-view
counts and image extents per round.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PMDynamic, PMStatic
from ..engine.patchmatch import run_pass
from ..engine.state import PassOutput


def shard_problems(tree, mesh: Mesh, axis: str = "views"):
    """Place a problem-batched pytree (leading axis = problems) on the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def make_batched_pass(static: PMStatic, mesh: Optional[Mesh] = None,
                      axis: str = "views", donate: bool = False):
    """jitted run_pass over a leading problem axis: shard_map + lax.map.

    The batch axis shards over the mesh with ``shard_map`` and each device
    runs its LOCAL problems one at a time through an unbatched ``run_pass``
    (``lax.map``; a local batch of one short-circuits the scan).  NOT
    ``vmap``: vmapping the pass prepends the batch dim to the Pallas
    kernels' SMEM scalar operands, which Mosaic cannot lower on TPU
    (verified round 4 — ``Block spec ... (Squeezed(), Blocked(8)) ... in
    memory space smem``), and batching every op also multiplies the XLA
    program size, which blew the CPU compile budget of MULTICHIP_r04.
    Per-slice execution keeps the compiled program identical to the
    single-view pass (same kernels, same fusion decisions) regardless of
    batch size, so the production Pallas backend lowers under the mesh.

    Inputs (leading axis B = number of problems, divisible by the mesh):
      ref_imgs   [B, H, W]
      src_imgs   [B, V, H, W]
      ref_cams   Camera pytree with leading [B]
      src_cams   Camera pytree with leading [B, V]
      dyn        PMDynamic with leading [B] scalars
      keys       [B] PRNG keys
      optional: init_plane_world [B, H, W, 4], init_sel [B, H, W, V],
                init_weak [B, H, W], src_depths [B, V, H, W]
    """
    fn = partial(run_pass, static=static)

    def one(sl):
        (ri, si, rc, sc, dd, kk, ipw, isel, iw, sd, rm, eg, lb) = sl
        return fn(ri, si, rc, sc, dyn=dd, key=kk, init_plane_world=ipw,
                  init_sel_views=isel, init_weak=iw, src_depths=sd,
                  radius_map=rm, edge=eg, label=lb)

    def local(*xs):
        n_local = xs[5].shape[0]              # keys [B_local, 2]
        if n_local == 1:
            out = one(jax.tree.map(lambda a: a[0], xs))
            return jax.tree.map(lambda a: a[None], out)
        return jax.lax.map(one, xs)

    def batched(ref_imgs, src_imgs, ref_cams, src_cams, dyn, keys,
                init_plane_world=None, init_sel=None, init_weak=None,
                src_depths=None, radius_map=None, edge=None, label=None):
        xs = (ref_imgs, src_imgs, ref_cams, src_cams, dyn, keys,
              init_plane_world, init_sel, init_weak, src_depths,
              radius_map, edge, label)
        if mesh is None:
            return local(*xs)
        return jax.shard_map(local, mesh=mesh, in_specs=P(axis),
                             out_specs=P(axis), check_vma=False)(*xs)

    if mesh is None:
        return jax.jit(batched)
    spec = NamedSharding(mesh, P(axis))
    return jax.jit(batched, out_shardings=spec)


def run_views_sharded(static: PMStatic, mesh: Mesh, ref_imgs, src_imgs,
                      ref_cams, src_cams, dyn, keys, **kw) -> PassOutput:
    """Convenience wrapper: shard inputs, run the batched pass."""
    fn = make_batched_pass(static, mesh)
    args = shard_problems((ref_imgs, src_imgs, ref_cams, src_cams, dyn, keys),
                          mesh)
    kw_sharded = {k: (shard_problems(v, mesh) if v is not None else None)
                  for k, v in kw.items()}
    return fn(*args, **kw_sharded)


def exchange_src_depths(depths: jnp.ndarray, src_index: jnp.ndarray
                        ) -> jnp.ndarray:
    """Cross-view depth exchange for geometric passes.

    depths    [B, H, W]  per-problem depth maps (view-sharded)
    src_index [B, V]     for each problem, the PROBLEM indices of its srcs
    returns   [B, V, H, W] source depth stacks.

    Under a views-sharded mesh XLA inserts the all-gather implied by the
    cross-shard take (each chip reads every other chip's depth map once per
    pass — the minimal communication the algorithm admits).
    """
    return jnp.take(depths, src_index, axis=0)
