"""Cross-view consistency filtering and point-cloud fusion.

Oracles: ``RunFusion`` (ETH3D, APD.cpp:1809-1960),
``RunFusion_TAT_Intermediate`` (APD.cpp:1962-2130),
``RunFusion_TAT_advanced`` (APD.cpp:2132-2279).

Per reference view, each pixel is projected into every source view; a source
pixel supports it when the forward-backward reprojection error, relative
depth difference and normal angle pass the variant's thresholds:
  * eth3d: err < 2 px, rdd < 0.01, angle < 10 deg; accept when the dynamic
    consistency sum(exp(-(err + 200 rdd + 10 angle))) exceeds 0.45*n for
    WEAK pixels / 0.3*n otherwise;
  * tat_intermediate: accept at the smallest k in [2, n] with >= k views
    satisfying err < 0.25k, rdd < k/3500, angle < 3k + 4 deg;
  * tat_advanced: like intermediate with rdd < k/3000 and no angle test.

TPU redesign: the per-(ref, src) geometric tests are dense jitted [H, W]
kernels; the reference's order-dependent greedy consumed-pixel masking runs
as a host-sequential loop over reference views (the masks are the only
cross-view mutable state, exactly as in the reference's view order).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import PixelState
from ..geometry.camera import Camera
from ..io.ply import write_ply


@dataclasses.dataclass
class FusionInputs:
    """Per-view fusion inputs keyed by image id."""

    images: Dict[int, np.ndarray]       # [H, W, 3] uint8 RGB (or gray x3)
    cameras: Dict[int, Camera]          # at depth-map resolution
    depths: Dict[int, np.ndarray]       # [H, W] float32
    normals: Dict[int, np.ndarray]      # [H, W, 3] world normals
    weaks: Dict[int, np.ndarray]        # [H, W] int8 PixelState
    problems: List                      # scene Problems (ref + src ids)
    blocks: Optional[Dict[int, np.ndarray]] = None   # optional masks


@partial(jax.jit, static_argnames=("variant",))
def _pair_consistency(ref_depth, ref_normal, ref_cam: Camera,
                      src_depth, src_normal, src_cam: Camera,
                      src_mask, variant: str):
    """All-pixel consistency of one (ref, src) pair.

    Returns (err, rdd, angle, src_r, src_c, valid) as [H, W] arrays.
    """
    H, W = ref_depth.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    def apply33(M, x, y, z):
        return (M[0, 0] * x + M[0, 1] * y + M[0, 2] * z,
                M[1, 0] * x + M[1, 1] * y + M[1, 2] * z,
                M[2, 0] * x + M[2, 1] * y + M[2, 2] * z)

    # ref pixel -> world
    px = ref_depth * (xs - ref_cam.cx) / ref_cam.fx
    py = ref_depth * (ys - ref_cam.cy) / ref_cam.fy
    wx, wy, wz = apply33(ref_cam.R.T, px, py, ref_depth)
    c = ref_cam.c
    wx, wy, wz = wx + c[0], wy + c[1], wz + c[2]

    # project into src
    sx_, sy_, sz_ = apply33(src_cam.R, wx, wy, wz)
    sx_, sy_, sz_ = sx_ + src_cam.t[0], sy_ + src_cam.t[1], sz_ + src_cam.t[2]
    hx, hy, hz = apply33(src_cam.K, sx_, sy_, sz_)
    hz = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
    spx = hx / hz
    spy = hy / hz
    src_c = jnp.floor(spx + 0.5).astype(jnp.int32)
    src_r = jnp.floor(spy + 0.5).astype(jnp.int32)
    Hs, Ws = src_depth.shape
    inb = (src_c >= 0) & (src_c < Ws) & (src_r >= 0) & (src_r < Hs)
    rc = jnp.clip(src_r, 0, Hs - 1)
    cc = jnp.clip(src_c, 0, Ws - 1)
    sflat = rc * Ws + cc
    sd = src_depth.reshape(-1)[sflat]
    sn = src_normal.reshape(-1, 3)[sflat]
    smask = src_mask.reshape(-1)[sflat]

    # src pixel -> world -> reproject into ref
    bx = sd * (cc.astype(jnp.float32) - src_cam.cx) / src_cam.fx
    by = sd * (rc.astype(jnp.float32) - src_cam.cy) / src_cam.fy
    wx2, wy2, wz2 = apply33(src_cam.R.T, bx, by, sd)
    sc = src_cam.c
    wx2, wy2, wz2 = wx2 + sc[0], wy2 + sc[1], wz2 + sc[2]
    rx_, ry_, rz_ = apply33(ref_cam.R, wx2, wy2, wz2)
    rx_, ry_, rz_ = rx_ + ref_cam.t[0], ry_ + ref_cam.t[1], rz_ + ref_cam.t[2]
    h2x, h2y, h2z = apply33(ref_cam.K, rx_, ry_, rz_)
    h2z = jnp.where(jnp.abs(h2z) < 1e-12, 1e-12, h2z)
    bpx = h2x / h2z
    bpy = h2y / h2z

    err = jnp.hypot(xs - bpx, ys - bpy)
    # APD.cpp:1923: relative diff between the point's SRC-projected depth and
    # the ref depth... the reference reuses proj_depth from the backward
    # projection (the ref-frame depth of the src point)
    rdd = jnp.abs(h2z - ref_depth) / jnp.maximum(ref_depth, 1e-12)
    cosang = jnp.clip(jnp.sum(ref_normal * sn, axis=-1)
                      / jnp.maximum(jnp.linalg.norm(ref_normal, axis=-1)
                                    * jnp.linalg.norm(sn, axis=-1), 1e-12),
                      -1.0, 1.0)
    angle = jnp.arccos(cosang)
    valid = inb & (sd > 0) & (smask == 0)
    return err, rdd, angle, src_r, src_c, valid


@partial(jax.jit, static_argnames=())
def _all_pairs_consistency(ref_depths, ref_normals, ref_cams,
                           src_index, all_cams):
    """Consistency fields for every (ref, src) pair in one program.

    ref_depths/normals: [B, H, W(,3)] per-problem state (views-shardable);
    src_index [B, Vm]: problem indices of each ref's sources (pad = repeat);
    all_cams: Camera pytree with leading [B].

    The cross-shard ``take`` on the depth/normal stacks is the fusion
    analogue of dist.sharding.exchange_src_depths — XLA inserts the
    all-gather when the batch axis is sharded over the ``views`` mesh.
    Masks (the serial greedy state) are NOT consulted: the sharded path
    resolves consumed pixels afterwards with a deterministic ownership
    rule (lowest problem order wins).
    """
    src_depths = jnp.take(ref_depths, src_index, axis=0)    # [B, Vm, H, W]
    src_normals = jnp.take(ref_normals, src_index, axis=0)
    src_cams = jax.tree.map(lambda a: jnp.take(a, src_index, axis=0),
                            all_cams)
    no_mask = jnp.zeros_like(ref_depths[0], jnp.uint8)

    def one_ref(rd, rn, rc, sds, sns, scs):
        return jax.vmap(
            lambda sd, sn, sc: _pair_consistency(
                rd, rn, rc, sd, sn, sc, no_mask, "eth3d"))(sds, sns, scs)

    return jax.vmap(one_ref)(ref_depths, ref_normals, ref_cams,
                             src_depths, src_normals, src_cams)


def run_fusion_sharded(inputs: FusionInputs, variant: str = "eth3d",
                       out_ply: Optional[str] = None, mesh=None
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Fusion with view-parallel consistency and deterministic ownership.

    The reference's greedy consumed-pixel masks (APD.cpp:1936-1952) force
    strict view-order serialization: view r's acceptance depends on every
    earlier view's consumption.  Here:

      1. consistency fields for ALL (ref, src) pairs run as ONE jitted
         batch, shardable over the ``views`` mesh axis (each chip holds a
         slice of reference views; source maps arrive via the implied
         all-gather);
      2. ownership: a source pixel is CONSUMED by the lowest-order
         reference view that supports an accepted pixel with it in the
         mask-free pass (deterministic, order-independent computation);
      3. acceptance re-runs with consumed supports removed and consumed
         reference pixels dropped.

    Deviation from the serial greedy (documented): consumption derives
    from the mask-free acceptance instead of the running masks, so a view
    may consume pixels it would not have reached serially; measured point
    counts agree within a few percent (tests/test_pipeline.py::
    test_sharded_fusion_matches_serial).
    """
    assert variant in ("eth3d", "tat_intermediate", "tat_advanced")
    probs = [p for p in inputs.problems
             if any(s in inputs.depths for s in p.src_image_ids)]
    ids = [p.ref_image_id for p in probs]
    if not ids:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint8)
    B = len(ids)
    # Source-only views (depth map present but not a retained reference
    # problem) still contribute supports, as in serial run_fusion; they
    # join the consistency batch but never emit points of their own.
    all_ids = list(ids)
    seen = set(ids)
    for p in probs:
        for s in p.src_image_ids:
            if s in inputs.depths and s not in seen:
                seen.add(s)
                all_ids.append(s)
    Ball = len(all_ids)
    order = {rid: i for i, rid in enumerate(all_ids)}
    H, W = inputs.depths[ids[0]].shape
    Vm = max(len(p.src_image_ids) for p in probs)
    src_index = np.zeros((Ball, Vm), np.int32)
    n_src = np.zeros((Ball,), np.int32)
    for i, p in enumerate(probs):
        srcs = [s for s in p.src_image_ids if s in inputs.depths]
        n_src[i] = len(srcs)
        pad = srcs + [srcs[-1] if srcs else ids[i]] * (Vm - len(srcs))
        src_index[i] = [order[s] for s in pad]
    for i in range(B, Ball):
        src_index[i] = i          # source-only rows: self-pairs, n_src = 0

    # pad the batch to a mesh multiple (repeated refs; results sliced off)
    n_dev = mesh.shape["views"] if mesh is not None else 1
    Bp = -(-Ball // n_dev) * n_dev
    pad_ids = all_ids + [all_ids[-1]] * (Bp - Ball)
    src_index_p = np.concatenate(
        [src_index, np.repeat(src_index[-1:], Bp - Ball, axis=0)])

    ref_depths = jnp.asarray(np.stack([inputs.depths[r] for r in pad_ids]))
    ref_normals = jnp.asarray(np.stack([inputs.normals[r]
                                        for r in pad_ids]))
    ref_cams = jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[inputs.cameras[r] for r in pad_ids])
    sidx = jnp.asarray(src_index_p)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P("views"))
        ref_depths, ref_normals, ref_cams = jax.device_put(
            (ref_depths, ref_normals, ref_cams), sh)
    errs, rdds, angs, srs, scs, vals = (
        np.asarray(a)[:B] for a in _all_pairs_consistency(
            ref_depths, ref_normals, ref_cams, sidx, ref_cams))
    jvalid = (np.arange(Vm)[None] < n_src[:B, None])         # [B, Vm]
    vals = vals & jvalid[..., None, None]

    def acceptance(vals_f):
        """Per-ref acceptance + support sets given filtered validity."""
        accepts, useds = [], []
        for i, rid in enumerate(ids):
            weak = np.asarray(inputs.weaks[rid])
            ref_ok = inputs.depths[rid] > 0
            if inputs.blocks is not None and rid in (inputs.blocks or {}):
                ref_ok &= inputs.blocks[rid] >= 128
            e, d, a, v = errs[i], rdds[i], angs[i], vals_f[i]
            if variant == "eth3d":
                support = v & (e < 2.0) & (d < 0.01) & (a < 0.174533)
                dyn = np.where(support,
                               np.exp(-(e + 200.0 * d + 10.0 * a)), 0.0)
                n_cons = support.sum(axis=0)
                dyn_sum = dyn.sum(axis=0)
                factor = np.where(weak == PixelState.WEAK, 0.45, 0.3)
                accept = ref_ok & (n_cons >= 1) & (dyn_sum > factor * n_cons)
                used = support
            else:
                depth_base = (1.0 / 3500.0 if variant == "tat_intermediate"
                              else 1.0 / 3000.0)
                accept = np.zeros((H, W), bool)
                used = np.zeros_like(v)
                for k in range(2, int(n_src[i]) + 1):
                    cond = v & (e < 0.25 * k) & (d < depth_base * k)
                    if variant == "tat_intermediate":
                        cond &= a < (0.05235988 * k + 0.06981317)
                    newly = ref_ok & (cond.sum(axis=0) >= k) & ~accept
                    accept |= newly
                    used = np.where(newly[None], cond, used)
                used = used & accept[None]
            accepts.append(accept)
            useds.append(used)
        return accepts, useds

    # pass 1: mask-free acceptance -> deterministic ownership claims
    accepts0, useds0 = acceptance(vals)
    BIG = B + 1
    consumed = np.full((Ball, H, W), BIG, np.int32)  # owner order per pixel
    for i in range(B):
        for j in range(int(n_src[i])):
            uj = useds0[i][j] & accepts0[i]
            if not uj.any():
                continue
            tgt = src_index[i, j]
            np.minimum.at(consumed[tgt],
                          (srs[i, j][uj], scs[i, j][uj]), i)

    # pass 2: drop supports/ref pixels consumed by a LOWER-order view
    vals2 = vals.copy()
    for i in range(B):
        for j in range(int(n_src[i])):
            tgt = src_index[i, j]
            own = consumed[tgt][np.clip(srs[i, j], 0, H - 1),
                                np.clip(scs[i, j], 0, W - 1)]
            vals2[i, j] &= own >= i
    accepts, useds = acceptance(vals2)

    all_pts, all_cols = [], []
    for i, rid in enumerate(ids):
        accept = accepts[i] & (consumed[i] >= i)
        ys, xs = np.nonzero(accept)
        if len(ys) == 0:
            continue
        cam = inputs.cameras[rid]
        K = np.asarray(cam.K)
        R = np.asarray(cam.R)
        c0 = np.asarray(cam.c)
        d0 = inputs.depths[rid][ys, xs]
        pc = np.stack([d0 * (xs - K[0, 2]) / K[0, 0],
                       d0 * (ys - K[1, 2]) / K[1, 1], d0], axis=-1)
        pw = pc @ R + c0
        col = inputs.images[rid][ys, xs].astype(np.float64)
        cnt = np.ones(len(ys))
        for j in range(int(n_src[i])):
            uj = useds[i][j, ys, xs]
            if not np.any(uj):
                continue
            sid = all_ids[src_index[i, j]]
            col[uj] += inputs.images[sid][srs[i, j, ys, xs][uj],
                                          scs[i, j, ys, xs][uj]]
            cnt[uj] += 1
        all_pts.append(pw.astype(np.float32))
        all_cols.append((col / cnt[:, None])[:, ::-1].astype(np.uint8))

    if all_pts:
        pts = np.concatenate(all_pts)
        cols = np.concatenate(all_cols)
    else:
        pts = np.zeros((0, 3), np.float32)
        cols = np.zeros((0, 3), np.uint8)
    if out_ply is not None:
        write_ply(out_ply, pts, cols)
    return pts, cols


def run_fusion(inputs: FusionInputs, variant: str = "eth3d",
               out_ply: Optional[str] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Fuse all views -> (points [N, 3], colors_bgr [N, 3])."""
    assert variant in ("eth3d", "tat_intermediate", "tat_advanced")
    ids = [p.ref_image_id for p in inputs.problems]
    masks = {i: np.zeros(inputs.depths[i].shape, np.uint8) for i in ids}

    all_pts: List[np.ndarray] = []
    all_cols: List[np.ndarray] = []

    for prob in inputs.problems:
        rid = prob.ref_image_id
        ref_depth = inputs.depths[rid]
        ref_normal = inputs.normals[rid]
        ref_cam = inputs.cameras[rid]
        H, W = ref_depth.shape
        src_ids = [s for s in prob.src_image_ids if s in inputs.depths]
        n_src = len(src_ids)
        if n_src == 0:
            continue

        errs = np.zeros((n_src, H, W), np.float32)
        rdds = np.zeros((n_src, H, W), np.float32)
        angs = np.zeros((n_src, H, W), np.float32)
        srs = np.zeros((n_src, H, W), np.int32)
        scs = np.zeros((n_src, H, W), np.int32)
        vals = np.zeros((n_src, H, W), bool)
        for j, sid in enumerate(src_ids):
            e, d, a, sr, sc, v = _pair_consistency(
                jnp.asarray(ref_depth), jnp.asarray(ref_normal), ref_cam,
                jnp.asarray(inputs.depths[sid]),
                jnp.asarray(inputs.normals[sid]),
                inputs.cameras[sid], jnp.asarray(masks[sid]), variant)
            errs[j], rdds[j], angs[j] = np.asarray(e), np.asarray(d), np.asarray(a)
            srs[j], scs[j], vals[j] = np.asarray(sr), np.asarray(sc), np.asarray(v)

        weak = np.asarray(inputs.weaks[rid])
        ref_ok = (ref_depth > 0) & (masks[rid] == 0)
        if inputs.blocks is not None and rid in (inputs.blocks or {}):
            ref_ok &= inputs.blocks[rid] >= 128

        if variant == "eth3d":
            support = vals & (errs < 2.0) & (rdds < 0.01) & (angs < 0.174533)
            dyn = np.where(support,
                           np.exp(-(errs + 200.0 * rdds + 10.0 * angs)), 0.0)
            n_cons = support.sum(axis=0)
            dyn_sum = dyn.sum(axis=0)
            factor = np.where(weak == PixelState.WEAK, 0.45, 0.3)
            accept = ref_ok & (n_cons >= 1) & (dyn_sum > factor * n_cons)
            used = support
        else:
            depth_base = 1.0 / 3500.0 if variant == "tat_intermediate" else 1.0 / 3000.0
            accept = np.zeros((H, W), bool)
            used = np.zeros_like(vals)
            best_k = np.full((H, W), -1, np.int32)
            for k in range(2, n_src + 1):
                cond = vals & (errs < 0.25 * k) & (rdds < depth_base * k)
                if variant == "tat_intermediate":
                    cond &= angs < (0.05235988 * k + 0.06981317)
                cnt = cond.sum(axis=0)
                newly = ref_ok & (cnt >= k) & ~accept
                accept |= newly
                used = np.where(newly[None], cond, used)
            used = used & accept[None]

        ys, xs = np.nonzero(accept)
        if len(ys) == 0:
            continue
        # world points of accepted ref pixels
        K = np.asarray(ref_cam.K)
        R = np.asarray(ref_cam.R)
        cc0 = np.asarray(ref_cam.c)
        d0 = ref_depth[ys, xs]
        pc = np.stack([d0 * (xs - K[0, 2]) / K[0, 0],
                       d0 * (ys - K[1, 2]) / K[1, 1], d0], axis=-1)
        pw = pc @ R + cc0

        img = inputs.images[rid]
        col = img[ys, xs].astype(np.float64)
        cnt = np.ones(len(ys))
        for j, sid in enumerate(src_ids):
            uj = used[j, ys, xs]
            if not np.any(uj):
                continue
            sr = srs[j, ys, xs][uj]
            sc = scs[j, ys, xs][uj]
            # consume src pixels (greedy masking, reference view order)
            masks[sid][sr, sc] = 1
            col[uj] += inputs.images[sid][sr, sc]
            cnt[uj] += 1
        col = col / cnt[:, None]

        all_pts.append(pw.astype(np.float32))
        # PLY colors are BGR (reference OpenCV heritage)
        all_cols.append(col[:, ::-1].astype(np.uint8))

    if all_pts:
        pts = np.concatenate(all_pts)
        cols = np.concatenate(all_cols)
    else:
        pts = np.zeros((0, 3), np.float32)
        cols = np.zeros((0, 3), np.uint8)

    if out_ply is not None:
        write_ply(out_ply, pts, cols)
    return pts, cols
