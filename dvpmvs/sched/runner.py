"""Per-scene scheduler: the multi-scale / multi-pass outer loop.

Oracle: ``main()`` (main.cpp:421-528):
  for round i in [0, R): scale = 2^(R-1-i)
      photometric pass over all views   (i==0: FIRST_INIT, else REFINE_INIT)
      3 x geometric passes over all views (REFINE_ITER, geom_consistency)
  fusion

Between passes every view persists its full state (depth/normal/weak/
selected_views/radius — the reference's .dmb/.bin files); geometric passes
read the OTHER views' depths from the previous pass — the cross-view
synchronization point.  After every pass the per-source visibility masks are
cleaned by connected components (small unselected islands flip to selected,
main.cpp:287-363).

The runner keeps state in memory (optionally checkpointing to the
reference's binary formats for crash-resume) and calls the jitted engine
per (problem, pass).  View-level distribution plugs in via dvpmvs.dist.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import (PMDynamic, PMStatic, PixelState, RunState, SceneConfig,
                      num_rounds_for, round_pass_params)
from ..engine.patchmatch import run_pass
from ..geometry.camera import Camera, scale_camera, stack_cameras
from ..io import write_bin_mat
from ..io.scene import Scene, format_index
from ..priors.edges import _resize_linear, connected_components, edge_segment
from ..utils.profiling import Metrics, annotate, trace


def rescale_nearest(arr: np.ndarray, new_hw) -> np.ndarray:
    """Nearest-neighbor state rescaling (RescaleMatToTargetSize semantics,
    APD.cpp:1773-1795, without its swapped-factor quirk)."""
    H, W = arr.shape[:2]
    nh, nw = new_hw
    if (H, W) == (nh, nw):
        return arr
    ys = np.clip(np.round(np.arange(nh) * H / nh).astype(int), 0, H - 1)
    xs = np.clip(np.round(np.arange(nw) * W / nw).astype(int), 0, W - 1)
    return arr[np.ix_(ys, xs)]


def visibility_cleanup(sel_views: np.ndarray, scale_size: int) -> np.ndarray:
    """Flip small unselected islands to selected (main.cpp:287-363)."""
    H, W, V = sel_views.shape
    thresh = 20 * (8 // max(scale_size, 1)) ** 2
    out = sel_views.copy()
    for v in range(V):
        sel = out[..., v]
        lab, cnt = connected_components((sel * 255).astype(np.uint8))
        small = (cnt[np.maximum(lab, 0)] < thresh) & (lab > 0)
        out[..., v] = sel | small
    return out


@dataclasses.dataclass
class ViewState:
    depth: np.ndarray
    normal_world: np.ndarray
    weak: np.ndarray
    sel_views: np.ndarray       # [H, W, V] bool
    radius: np.ndarray


class SceneRunner:
    def __init__(self, scene: Scene, config: Optional[SceneConfig] = None,
                 base_static: Optional[PMStatic] = None,
                 mono_planes: Optional[Dict[int, np.ndarray]] = None,
                 verbose: bool = True):
        self.scene = scene
        self.config = config or SceneConfig()
        self.base_static = base_static or PMStatic()
        self.mono_planes = mono_planes or {}
        self.state: Dict[int, ViewState] = {}
        self.edge_cache: Dict[tuple, np.ndarray] = {}
        self.label_cache: Dict[tuple, np.ndarray] = {}
        self.verbose = verbose
        self.iteration = 0
        self.metrics = Metrics()
        # jitted run_pass per static config — one compile per (config,
        # shape); the schedule reuses it across views and passes
        self._pass_fns: Dict[PMStatic, object] = {}
        # device-resident batched round state (run_pass_batched): the
        # previous pass's PassOutput + batch layout, so geometric passes
        # feed init/src_depths straight from device arrays (the all-gather
        # of dist.sharding.exchange_src_depths) instead of rebuilding from
        # host numpy — the reference's file-based cross-view sync point
        # (APD.cpp:1147-1166) becomes an ICI collective.
        self._dev = None
        # multi-host runners mutate self.state between passes (foreign-view
        # sync), so the device-resident shortcut must not skip the host
        # state; MultiHostRunner sets this True.
        self._sync_each_pass = False

        any_img = next(iter(scene.images.values()))
        self.rounds = num_rounds_for(any_img.shape[1], any_img.shape[0],
                                     self.config.max_base_size)
        # The reference runs round_num - 1 rounds (main.cpp:450 stops at
        # i < round_num - 1), i.e. the finest processed scale is 1/2; a
        # full-resolution extra round is opt-in (config.full_res_round).
        # Scenes small enough for round_num == 1 still run one round.
        self.rounds_to_run = max(self.rounds - 1, 1)
        if self.config.full_res_round and self.rounds > 1:
            self.rounds_to_run = self.rounds

    # ------------------------------------------------------------------
    def _log(self, msg):
        if self.verbose:
            print(f"[dvpmvs] {msg}", flush=True)

    def _scaled_view(self, image_id: int, scale_size: int):
        img = self.scene.images[image_id]
        H, W = img.shape
        nh, nw = round(H / scale_size), round(W / scale_size)
        simg = _resize_linear(img.astype(np.float32), (nh, nw))
        cam = scale_camera(self.scene.cameras[image_id], nw / W, nh / H)
        return simg, cam

    def _edges_for(self, image_id: int, scale_size: int, need_label: bool):
        scale = 0
        while (1 << scale) < scale_size:
            scale += 1
        ek = (image_id, scale)
        edge = label = None
        if self.base_static.use_edge:
            if ek not in self.edge_cache:
                self.edge_cache[ek] = edge_segment(
                    scale, self.scene.images[image_id], mode=0, use_canny=True)
            edge = self.edge_cache[ek]
        if need_label and self.base_static.use_label:
            if ek not in self.label_cache:
                self.label_cache[ek] = self._load_or_compute_label(
                    image_id, scale)
            label = self.label_cache[ek]
        return edge, label

    def _load_or_compute_label(self, image_id: int, scale: int) -> np.ndarray:
        """Segmentation-label map for one view: an external
        ``MVS4/%08d.dmb`` file (a TSAR-MVS-style float map rescaled to the
        image extent, APD.cpp:1634-1645) is preferred when present;
        otherwise self-compute with the Roberts/CC/Hough pipeline (the
        reference's EdgeSegment mode-1 path)."""
        mvs4 = (Path(self.scene.dense_folder) / "MVS4"
                / f"{image_id:08d}.dmb") if self.scene.dense_folder else None
        if mvs4 is not None and mvs4.is_file():
            from ..io.dmb import read_dmb
            lab = np.asarray(read_dmb(mvs4))
            ih, iw = self.scene.images[image_id].shape
            if lab.shape != (ih, iw):
                lab = rescale_nearest(lab.astype(np.float32), (ih, iw))
            return lab.astype(np.int32)
        return edge_segment(scale, self.scene.images[image_id], mode=1,
                            use_canny=False)

    # ------------------------------------------------------------------
    _BUDGET_BUCKETS = (0.125, 0.25, 0.375, 0.5)

    def _weak_budget_for(self, static: PMStatic, rids) -> PMStatic:
        """Adaptive compaction budget: round the measured weak fraction of
        the input state up to a bucket (bounded recompiles).  The slot-
        exact anchor terms are linear in the budget (BASELINE.md round-4
        measurement: 12.2 s at 0.5, 9.95 s at 0.3, 6.4 s floor), and
        in-pass demotions only shrink the weak set, so the input fraction
        is an upper bound for the whole pass."""
        if not static.use_APD:
            return static
        frac = 0.0
        for rid in rids:
            st = self.state.get(rid)
            if st is None:
                return static
            frac = max(frac, float((st.weak == PixelState.WEAK).mean()))
        need = frac * 1.15 + 0.02
        bucket = next((b for b in self._BUDGET_BUCKETS if need <= b),
                      self._BUDGET_BUCKETS[-1])
        return static.replace(weak_budget_frac=bucket)

    def run_view_pass(self, problem, static: PMStatic, dyn: PMDynamic,
                      scale_size: int, key) -> None:
        rid = problem.ref_image_id
        static = self._weak_budget_for(static, [rid])
        ref_img, ref_cam = self._scaled_view(rid, scale_size)
        H, W = ref_img.shape
        src_list = []
        for sid in problem.src_image_ids:
            simg, _ = self._scaled_view(sid, scale_size)
            # pad/crop source to the ref extent (APD.cpp:1071-1082)
            canvas = np.zeros((H, W), np.float32)
            hh = min(H, simg.shape[0])
            ww = min(W, simg.shape[1])
            canvas[:hh, :ww] = simg[:hh, :ww]
            src_list.append(canvas)
        src_imgs = np.stack(src_list)
        src_cams = stack_cameras(
            [self._scaled_view(sid, scale_size)[1]
             for sid in problem.src_image_ids])

        dyn = dyn.replace(
            depth_min=jnp.asarray(float(ref_cam.depth_min) * 0.6, jnp.float32),
            depth_max=jnp.asarray(float(ref_cam.depth_max) * 1.2, jnp.float32))

        kwargs = {}
        st = self.state.get(rid)
        if static.state != RunState.FIRST_INIT:
            assert st is not None, f"view {rid}: no previous state"
            depth = rescale_nearest(st.depth, (H, W))
            normal = rescale_nearest(st.normal_world, (H, W))
            kwargs["init_plane_world"] = jnp.asarray(
                np.concatenate([normal, depth[..., None]], -1))
            kwargs["init_sel_views"] = jnp.asarray(
                rescale_nearest(st.sel_views.astype(np.uint8), (H, W))
                .astype(bool))
            kwargs["init_weak"] = jnp.asarray(
                rescale_nearest(st.weak, (H, W)))
            if static.use_radius:
                kwargs["radius_map"] = jnp.asarray(
                    rescale_nearest(st.radius, (H, W)))
        elif rid in self.mono_planes:
            mp = self.mono_planes[rid]
            if mp.shape[:2] != (H, W):
                mp = np.stack([rescale_nearest(mp[..., i], (H, W))
                               for i in range(4)], -1)
            kwargs["init_plane_world"] = jnp.asarray(mp)

        if static.geom_consistency:
            sds = []
            for sid in problem.src_image_ids:
                sd = self.state.get(sid)
                d = sd.depth if sd is not None else np.zeros_like(ref_img)
                sds.append(rescale_nearest(d, (H, W)))
            kwargs["src_depths"] = jnp.asarray(np.stack(sds))

        if static.use_edge or (static.use_APD and static.use_label):
            edge, label = self._edges_for(
                rid, scale_size,
                need_label=static.use_APD and static.use_label)
            if edge is not None:
                kwargs["edge"] = jnp.asarray(
                    rescale_nearest(edge, (H, W)) > 0)
            if label is not None:
                kwargs["label"] = jnp.asarray(
                    rescale_nearest(label, (H, W)).astype(np.int32))

        # Phase-B tile sharding (config.mesh_tiles > 1): the per-view pass
        # row-shards over a `tile` mesh (dist.tiles — XLA SPMD inserts the
        # halo exchanges).  Falls back to single-device when the height
        # does not divide or Phase A is active.
        n_t = min(self.config.mesh_tiles, len(jax.devices()))
        tiled = (n_t > 1 and self.config.mesh_views <= 1 and H % n_t == 0)
        ck = (static, "tile", n_t) if tiled else static
        fn = self._pass_fns.get(ck)
        if fn is None:
            if tiled:
                from jax.sharding import Mesh

                from ..dist.tiles import make_tiled_pass

                fn = make_tiled_pass(
                    static, Mesh(np.asarray(jax.devices()[:n_t]), ("tile",)))
            else:
                fn = jax.jit(partial(run_pass, static=static))
            self._pass_fns[ck] = fn
        out = fn(jnp.asarray(ref_img), jnp.asarray(src_imgs), ref_cam,
                 src_cams, dyn=dyn, key=key, **kwargs)

        if out.weak_overflow is not None and int(out.weak_overflow) > 0:
            self.metrics.count("weak_budget_overflow_px",
                               int(out.weak_overflow))
            self._log(f"view {rid}: weak-compaction budget overflow "
                      f"{int(out.weak_overflow)} px fell back to "
                      f"center-window cost (raise weak_budget_frac)")
        sel = np.asarray(out.sel_views)
        sel = visibility_cleanup(sel, scale_size)
        self.state[rid] = ViewState(
            depth=np.asarray(out.depth), normal_world=np.asarray(out.normal_world),
            weak=np.asarray(out.weak), sel_views=sel,
            radius=np.asarray(out.radius))
        if static.debug_dumps:
            self._write_debug_dumps(problem, out)

    # ------------------------------------------------------------------
    def _write_debug_dumps(self, problem, out) -> None:
        """Reference debug-dump equivalents (PMStatic.debug_dumps):

        * ``weak_ncc_cost.bin`` — per-pixel disparity-sweep cost curves in
          the DEBUG_COST_LINE layout (APD.cu:4507-4524): int32 header
          [width, height, 61] then f32 [H, W, 61] row-major per pixel.
        * ``neighbour_map.bin`` / ``neighbour.bin`` — per-weak-pixel anchor
          lists in the DEBUG_NEIGHBOUR layout (APD.cu:4455-4470):
          neighbour_map is a WriteBinMat int32 map (index into the weak
          list, -1 elsewhere); neighbour.bin holds int32 [weak_count,
          neighbour_num] then int16 (x, y) pairs, first entry = the pixel
          itself, invalid anchors = (-1, -1).
        """
        import struct as _struct

        folder = Path(problem.result_folder)
        folder.mkdir(parents=True, exist_ok=True)
        if out.cost_line is not None:
            curve = np.moveaxis(np.asarray(out.cost_line), 0, -1)
            h, w, n = curve.shape
            with open(folder / "weak_ncc_cost.bin", "wb") as f:
                f.write(_struct.pack("<3i", w, h, n))
                f.write(np.ascontiguousarray(curve, np.float32).tobytes())
        if out.anchors_xy is not None:
            av = np.asarray(out.anchors_valid)            # [A, H, W]
            axy = np.asarray(out.anchors_xy)              # [A, H, W, 2]
            has = av.any(axis=0)
            ys2, xs2 = np.nonzero(has)
            wc = len(ys2)
            A = av.shape[0]
            ent = np.full((wc, A + 1, 2), -1, np.int16)
            ent[:, 0, 0] = xs2
            ent[:, 0, 1] = ys2
            sel_a = axy[:, ys2, xs2]                      # [A, wc, 2]
            ok_a = av[:, ys2, xs2]                        # [A, wc]
            ent[:, 1:, :] = np.where(ok_a[..., None], sel_a,
                                     -1).transpose(1, 0, 2)
            nmap = np.full(has.shape, -1, np.int32)
            nmap[ys2, xs2] = np.arange(wc, dtype=np.int32)
            write_bin_mat(folder / "neighbour_map.bin", nmap)
            with open(folder / "neighbour.bin", "wb") as f:
                f.write(_struct.pack("<2i", wc, A + 1))
                f.write(ent.tobytes())

    # ------------------------------------------------------------------
    def run(self, checkpoint_dir: Optional[Path] = None,
            resume: bool = False,
            profile_dir: Optional[str] = None) -> None:
        """Run the full multi-scale schedule.

        With ``checkpoint_dir``, every pass persists the full per-view state
        (the reference's implicit file-based checkpointing, main.cpp:365-376)
        plus a ``progress.json`` cursor; ``resume=True`` reloads the state
        and skips completed passes — the skip logic the reference lacks
        (SURVEY §5 checkpoint/resume).
        """
        base = self.base_static
        key = jax.random.PRNGKey(self.config.seed)
        R = self.rounds
        start_iter = 0
        if resume and checkpoint_dir is not None:
            start_iter = self.load_checkpoint(Path(checkpoint_dir))
            if start_iter:
                self._log(f"resuming at pass iteration {start_iter}")
        with trace(profile_dir):
            for i in range(self.rounds_to_run):
                for pass_idx in range(1 + self.config.geometric_passes):
                    if self.iteration < start_iter:
                        self.iteration += 1
                        continue
                    self.run_schedule_pass(i, pass_idx, key)
                    if checkpoint_dir is not None:
                        self.checkpoint(Path(checkpoint_dir))
        if checkpoint_dir is not None:
            self.write_benchmark_outputs(Path(checkpoint_dir))

    def run_schedule_pass(self, round_idx: int, pass_idx: int, key) -> None:
        """One (round, pass) step of the schedule over this runner's
        problems.  Exposed so distributed runners can interleave passes with
        cross-host synchronization.

        With ``config.mesh_views > 1`` the problems run as ONE view-sharded
        batch over a ``views`` device mesh (dist.sharding Phase A); the
        serial per-problem loop is the single-device fallback.
        """
        R = self.rounds
        scale_size = 2 ** (R - 1 - round_idx)
        static, dyn = round_pass_params(
            round_idx, R, pass_idx, self.base_static, 0.0, 1.0)
        t0 = time.time()
        span = f"round{round_idx}/pass{pass_idx}"
        with self.metrics.timed(span), annotate(span):
            if self.config.mesh_views > 1:
                self.run_pass_batched(self.scene.problems, static, dyn,
                                      scale_size, key)
            else:
                for problem in self.scene.problems:
                    k = jax.random.fold_in(
                        jax.random.fold_in(key, self.iteration),
                        problem.ref_image_id)
                    self.run_view_pass(problem, static, dyn, scale_size, k)
                    self.metrics.count("view_passes")
        self._log(f"round {round_idx} pass {pass_idx} "
                  f"(scale 1/{scale_size}, state={static.state.name}) "
                  f"done in {time.time() - t0:.1f}s")
        if self.config.show_medium_result and self.config.output_folder:
            self.write_medium_results(Path(self.config.output_folder))
        self.iteration += 1

    def write_medium_results(self, out_root: Path) -> None:
        """Per-pass depth/normal/weak visualizations (main.cpp:396-403,
        show_medium_result): <out>/<view>/{depths,normals,weak}_<iter>.jpg"""
        from ..utils.viz import (write_depth_viz, write_normal_viz,
                                 write_weak_viz)

        for rid, st in self.state.items():
            d = out_root / format_index(rid)
            d.mkdir(parents=True, exist_ok=True)
            cam = self.scene.cameras[rid]
            write_depth_viz(d / f"depths_{self.iteration}.jpg", st.depth,
                            float(cam.depth_min) * 0.6,
                            float(cam.depth_max) * 1.2)
            write_normal_viz(d / f"normals_{self.iteration}.jpg",
                             st.normal_world)
            write_weak_viz(d / f"weak_{self.iteration}.jpg", st.weak)

    # ------------------------------------------------------------------
    def run_pass_batched(self, problems, static: PMStatic, dyn: PMDynamic,
                         scale_size: int, key) -> None:
        """All problems of one pass as a single view-sharded batch.

        Problems are padded to a common (H, W, V) — exact for the usual
        uniform-resolution scenes (sources are padded to the ref extent by
        the reference too, APD.cpp:1071-1082); the batch axis is padded to a
        multiple of the mesh size by repeating problems (dropped at unbatch).
        """
        from ..dist.mesh import make_mesh
        from ..dist.sharding import (exchange_src_depths, make_batched_pass,
                                     shard_problems)

        n_dev = min(self.config.mesh_views, len(jax.devices()))
        B0 = len(problems)
        reps = -(-B0 // n_dev) * n_dev
        plist = [problems[i % B0] for i in range(reps)]
        static = self._weak_budget_for(
            static, [p.ref_image_id for p in plist])

        scaled = [self._scaled_view(p.ref_image_id, scale_size)
                  for p in plist]
        H = max(im.shape[0] for im, _ in scaled)
        W = max(im.shape[1] for im, _ in scaled)
        V = max(len(p.src_image_ids) for p in plist)

        # ---- device-resident fast path (geometric passes of a round) ----
        # When the previous batched pass of this round left its PassOutput
        # on device with the same layout, feed init state and source depths
        # from it directly: no host rescale/stack/upload, and the cross-view
        # depth exchange is a device-side gather (all-gather on a mesh).
        # Gated to uniform-extent batches (padded slots would re-enter the
        # pass with computed pad values instead of the host path's zero
        # fill) and to single-process runners (multi-host syncs mutate
        # self.state between passes).
        rid_order = tuple(p.ref_image_id for p in plist)
        layout = (rid_order, H, W, V, scale_size)
        rid2idx = {}
        for j, r in enumerate(rid_order):
            rid2idx.setdefault(r, j)
        src_index = np.asarray(
            [[rid2idx.get(sid, -1)
              for sid in (list(p.src_image_ids)
                          + [p.src_image_ids[-1]]
                          * (V - len(p.src_image_ids)))]
             for p in plist], np.int32)
        uniform = all(im.shape == (H, W) for im, _ in scaled)
        use_dev = (self._dev is not None
                   and self._dev["layout"] == layout
                   and static.state == RunState.REFINE_ITER
                   and not self._sync_each_pass
                   and uniform
                   and (not static.geom_consistency
                        or (src_index >= 0).all()))
        self._last_pass_device_resident = use_dev

        def pad_hw(a, fill=0.0):
            out = np.full((H, W) + a.shape[2:], fill, a.dtype)
            out[:a.shape[0], :a.shape[1]] = a
            return out

        mesh = make_mesh(n_dev) if n_dev > 1 else None
        need_state = static.state != RunState.FIRST_INIT
        want_edges = static.use_edge or (static.use_APD and static.use_label)
        need_label = static.use_APD and static.use_label

        # ---- state-independent args (images/cameras/edges): identical for
        # every pass of a round, so cache them on device across passes ----
        cache = self._dev.get("args") if self._dev is not None else None
        use_cache = (cache is not None
                     and self._dev["layout"] == layout
                     and cache["flags"] == (want_edges, need_label))
        if use_cache:
            args_static = cache
        else:
            ref_imgs, ref_cams, src_imgs, src_cams = [], [], [], []
            edges, labels, dyns = [], [], []
            for p, (rimg, rcam) in zip(plist, scaled):
                h, w = rimg.shape
                ref_imgs.append(pad_hw(rimg))
                ref_cams.append(rcam)
                srcs = list(p.src_image_ids)
                pad_ids = srcs + [srcs[-1]] * (V - len(srcs))
                simgs = []
                for sid in pad_ids[:len(srcs)]:
                    s, _ = self._scaled_view(sid, scale_size)
                    canvas = np.zeros((H, W), np.float32)
                    canvas[:min(H, s.shape[0]), :min(W, s.shape[1])] = \
                        s[:min(H, s.shape[0]), :min(W, s.shape[1])]
                    simgs.append(canvas)
                simgs += [np.zeros((H, W), np.float32)] * (V - len(srcs))
                src_imgs.append(np.stack(simgs))
                src_cams.append(stack_cameras(
                    [self._scaled_view(sid, scale_size)[1]
                     for sid in pad_ids]))
                dyns.append(dyn.replace(
                    depth_min=jnp.asarray(float(rcam.depth_min) * 0.6,
                                          jnp.float32),
                    depth_max=jnp.asarray(float(rcam.depth_max) * 1.2,
                                          jnp.float32)))
                if want_edges:
                    eg, lb = self._edges_for(p.ref_image_id, scale_size,
                                             need_label=need_label)
                    if eg is not None:
                        edges.append(pad_hw(rescale_nearest(eg, (h, w)) > 0))
                    if lb is not None:
                        labels.append(pad_hw(
                            rescale_nearest(lb, (h, w)).astype(np.int32)))
            stackc = lambda cs: jax.tree.map(lambda *xs: jnp.stack(xs), *cs)
            args_static = {
                "flags": (want_edges, need_label),
                "ref_imgs": jnp.asarray(np.stack(ref_imgs)),
                "src_imgs": jnp.asarray(np.stack(src_imgs)),
                "ref_cams": stackc(ref_cams),
                "src_cams": stackc(src_cams),
                "dyns": stackc(dyns),
                "edge": jnp.asarray(np.stack(edges)) if edges else None,
                "label": jnp.asarray(np.stack(labels)) if labels else None,
            }

        keys = [jax.random.fold_in(
                    jax.random.fold_in(key, self.iteration), p.ref_image_id)
                for p in plist]

        # ---- state-dependent inputs: device arrays from the previous
        # pass, or host rebuild (round start / fallback) ----
        kw = {}
        if use_dev:
            prev = self._dev["out"]
            kw["init_plane_world"] = jnp.concatenate(
                [prev.normal_world, prev.depth[..., None]], -1)
            kw["init_sel"] = self._dev["sel_clean"]
            kw["init_weak"] = prev.weak
            if static.use_radius:
                kw["radius_map"] = prev.radius
            if static.geom_consistency:
                # the reference's cross-view sync point (APD.cpp:1147-1166)
                # as a device-side gather — an all-gather over the views
                # mesh axis instead of a host depth-map round trip
                kw["src_depths"] = exchange_src_depths(
                    prev.depth, jnp.asarray(src_index))
        else:
            init_pw, init_sel, init_weak = [], [], []
            radius, src_depths = [], []
            for p, (rimg, rcam) in zip(plist, scaled):
                h, w = rimg.shape
                srcs = list(p.src_image_ids)
                pad_ids = srcs + [srcs[-1]] * (V - len(srcs))
                st = self.state.get(p.ref_image_id)
                if need_state:
                    assert st is not None
                    d = rescale_nearest(st.depth, (h, w))
                    nrm = rescale_nearest(st.normal_world, (h, w))
                    init_pw.append(pad_hw(
                        np.concatenate([nrm, d[..., None]], -1)))
                    sel = rescale_nearest(st.sel_views.astype(np.uint8),
                                          (h, w))
                    sel = np.pad(sel, ((0, 0), (0, 0),
                                       (0, V - sel.shape[-1])))
                    init_sel.append(pad_hw(sel.astype(bool)))
                    init_weak.append(pad_hw(
                        rescale_nearest(st.weak, (h, w)),
                        fill=PixelState.UNKNOWN))
                    if static.use_radius:
                        radius.append(pad_hw(
                            rescale_nearest(st.radius, (h, w))))
                elif p.ref_image_id in self.mono_planes:
                    mp = self.mono_planes[p.ref_image_id]
                    if mp.shape[:2] != (h, w):
                        mp = np.stack([rescale_nearest(mp[..., i], (h, w))
                                       for i in range(4)], -1)
                    init_pw.append(pad_hw(mp))
                if static.geom_consistency:
                    sds = []
                    for sid in pad_ids:
                        sd = self.state.get(sid)
                        dd = (rescale_nearest(sd.depth, (h, w))
                              if sd is not None
                              else np.zeros((h, w), np.float32))
                        sds.append(pad_hw(dd))
                    src_depths.append(np.stack(sds))
            if init_pw and len(init_pw) == reps:
                kw["init_plane_world"] = jnp.asarray(np.stack(init_pw))
            if init_sel:
                kw["init_sel"] = jnp.asarray(np.stack(init_sel))
                kw["init_weak"] = jnp.asarray(np.stack(init_weak))
            if radius:
                kw["radius_map"] = jnp.asarray(np.stack(radius))
            if src_depths:
                kw["src_depths"] = jnp.asarray(np.stack(src_depths))

        ck = (static, n_dev)
        fn = self._pass_fns.get(ck)
        if fn is None:
            fn = make_batched_pass(static, mesh)
            self._pass_fns[ck] = fn

        args = (args_static["ref_imgs"], args_static["src_imgs"],
                args_static["ref_cams"], args_static["src_cams"],
                args_static["dyns"], jnp.stack(keys))
        if args_static["edge"] is not None:
            kw["edge"] = args_static["edge"]
        if args_static["label"] is not None:
            kw["label"] = args_static["label"]
        if mesh is not None:
            args = shard_problems(args, mesh)
            kw = {k: shard_problems(v, mesh) for k, v in kw.items()}
        out = fn(*args, **kw)

        if out.weak_overflow is not None:
            mx = int(np.max(np.asarray(out.weak_overflow)))
            if mx > 0:
                self.metrics.count("weak_budget_overflow_px", mx)
                self._log(f"weak-compaction budget overflow: worst view "
                          f"{mx} px fell back to center-window cost")

        # ---- unbatch: per-src visibility CC cleanup stays host-side (the
        # reference's is too, main.cpp:287-363); the cleaned masks are
        # re-uploaded once as the next pass's init_sel so depth/normal
        # state itself never round-trips through the host inside a round.
        sel_clean = {}
        seen = set()
        for i, p in enumerate(plist):
            rid = p.ref_image_id
            if rid in seen:
                continue
            seen.add(rid)
            h, w = scaled[i][0].shape
            v = len(p.src_image_ids)
            sel = np.asarray(out.sel_views[i][:h, :w, :v])
            sel = visibility_cleanup(sel, scale_size)
            sel_clean[rid] = (i, h, w, sel)
            self.state[rid] = ViewState(
                depth=np.asarray(out.depth[i][:h, :w]),
                normal_world=np.asarray(out.normal_world[i][:h, :w]),
                weak=np.asarray(out.weak[i][:h, :w]),
                sel_views=sel,
                radius=np.asarray(out.radius[i][:h, :w]))
            self.metrics.count("view_passes")

        sel_batch = np.zeros((reps, H, W, V), bool)
        for i, p in enumerate(plist):
            _, h, w, sel = sel_clean[p.ref_image_id]
            sel_batch[i, :h, :w, :sel.shape[-1]] = sel
        sel_dev = jnp.asarray(sel_batch)
        if mesh is not None:
            sel_dev = shard_problems(sel_dev, mesh)
        self._dev = {"layout": layout, "out": out, "sel_clean": sel_dev,
                     "args": args_static}

    def write_benchmark_outputs(self, out_root: Path, view_ids=None) -> None:
        """Final-pass benchmark-format outputs per view (the reference's
        iteration==15 extras, main.cpp:378-385): ``depths_geom.dmb`` and
        ``normals.dmb`` in writeDepthDmb/writeNormalDmb format plus the
        ``weak.png`` state visualization."""
        from ..io.dmb import write_depth_dmb, write_normal_dmb
        from ..utils.viz import write_weak_viz

        ids = view_ids if view_ids is not None else sorted(self.state)
        for vid in ids:
            st = self.state[vid]
            d = out_root / format_index(vid)
            d.mkdir(parents=True, exist_ok=True)
            write_depth_dmb(d / "depths_geom.dmb",
                            np.asarray(st.depth, np.float32))
            write_normal_dmb(d / "normals.dmb",
                             np.asarray(st.normal_world, np.float32))
            write_weak_viz(d / "weak.png", np.asarray(st.weak))

    # ------------------------------------------------------------------
    def checkpoint(self, out_root: Path, view_ids=None) -> None:
        """Persist per-view state in the reference's binary formats.

        ``view_ids`` restricts the write (multi-host runners write only the
        views they own, so a host never overwrites another's fresher state).
        """
        import json

        out_root.mkdir(parents=True, exist_ok=True)
        items = (self.state.items() if view_ids is None
                 else [(r, self.state[r]) for r in view_ids if r in self.state])
        for rid, st in items:
            d = out_root / format_index(rid)
            d.mkdir(parents=True, exist_ok=True)
            write_bin_mat(d / "depths.dmb", st.depth.astype(np.float32))
            write_bin_mat(d / "APD_normals.dmb",
                          st.normal_world.astype(np.float32))
            write_bin_mat(d / "weak.bin", st.weak.astype(np.uint8))
            # selected_views as the reference's int32 bitmask
            V = st.sel_views.shape[-1]
            bits = np.zeros(st.sel_views.shape[:2], np.int32)
            for v in range(V):
                bits |= st.sel_views[..., v].astype(np.int32) << v
            write_bin_mat(d / "selected_views.bin", bits)
            write_bin_mat(d / "radius.bin", st.radius.astype(np.float32))
        written = sorted(r for r, _ in items)
        if not written:
            return
        progress = out_root / ("progress.json" if view_ids is None
                               else f"progress_{written[0]:08d}.json")
        progress.write_text(json.dumps(
            {"iteration": self.iteration,
             "rounds": self.rounds,
             "view_ids": written,
             "num_src": {str(r): int(s.sel_views.shape[-1])
                         for r, s in items}}))

    # ------------------------------------------------------------------
    def load_checkpoint(self, out_root: Path) -> int:
        """Reload per-view state written by :meth:`checkpoint`.

        Returns the pass-iteration cursor to resume from (0 if no
        checkpoint exists).  Mirrors the reference's re-read of
        depths.dmb/APD_normals.dmb/weak.bin/selected_views.bin/radius.bin
        at pass start (APD.cpp:1428-1456, 1647-1667).
        """
        import json

        from ..io import read_bin_mat

        progress = out_root / "progress.json"
        if not progress.exists():
            return 0
        self._dev = None          # host state supersedes device-resident
        meta = json.loads(progress.read_text())
        for rid in meta["view_ids"]:
            d = out_root / format_index(rid)
            depth = read_bin_mat(d / "depths.dmb").astype(np.float32)
            normal = read_bin_mat(d / "APD_normals.dmb").astype(np.float32)
            weak = read_bin_mat(d / "weak.bin").astype(np.int8)
            bits = read_bin_mat(d / "selected_views.bin").astype(np.int32)
            radius = read_bin_mat(d / "radius.bin").astype(np.float32)
            V = int(meta["num_src"][str(rid)])
            sel = np.stack([(bits >> v) & 1 for v in range(V)],
                           axis=-1).astype(bool)
            self.state[rid] = ViewState(depth=depth, normal_world=normal,
                                        weak=weak, sel_views=sel,
                                        radius=radius)
        return int(meta["iteration"])

    # ------------------------------------------------------------------
    def _load_blocks(self):
        """Optional fusion block masks ``blocks/mask_<id>.jpg`` (ETH3D crops,
        APD.cpp:1831-1859): pixels >= 128 participate in fusion."""
        folder = Path(self.scene.dense_folder) / "blocks"
        if not folder.exists():
            return None
        from PIL import Image

        blocks = {}
        for rid, st in self.state.items():
            p = folder / f"mask_{rid}.jpg"
            if not p.exists():
                continue
            m = np.asarray(Image.open(p).convert("L"))
            if m.shape != st.depth.shape:
                m = rescale_nearest(m, st.depth.shape)
            blocks[rid] = m
        return blocks or None

    def fusion_inputs(self):
        from ..fusion import FusionInputs

        images = {}
        cams = {}
        for rid in self.state:
            st = self.state[rid]
            H, W = st.depth.shape
            img = self.scene.colors.get(rid)
            if img is None:
                g = self.scene.images[rid]
                img = np.repeat(np.clip(g, 0, 255).astype(np.uint8)[..., None],
                                3, -1)
            if img.shape[:2] != (H, W):
                img = np.stack([rescale_nearest(img[..., c], (H, W))
                                for c in range(3)], -1)
            images[rid] = img
            ih, iw = self.scene.images[rid].shape
            cams[rid] = scale_camera(self.scene.cameras[rid], W / iw, H / ih)
        return FusionInputs(
            images=images, cameras=cams,
            depths={r: s.depth for r, s in self.state.items()},
            normals={r: s.normal_world for r, s in self.state.items()},
            weaks={r: s.weak for r, s in self.state.items()},
            problems=self.scene.problems,
            blocks=self._load_blocks())
