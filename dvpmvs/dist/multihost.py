"""Multi-host scene scheduling.

The reference is single-process/single-GPU (``cudaSetDevice``, main.cpp:434;
multi-GPU = run several processes by hand).  Here a scene distributes over a
TPU pod slice as:

  * chips within a host — Phase A view sharding / Phase B tile sharding
    (``dvpmvs.dist.sharding`` / ``dvpmvs.dist.tiles``), collectives on ICI;
  * hosts — each process owns the problems with
    ``index % process_count == process_index`` (views are independent within
    a pass); between passes the per-view state syncs through the shared
    checkpoint directory (the reference's own file-based state model,
    main.cpp:365-376), with a cross-host barrier on DCN so geometric passes
    see every source view's previous-pass depth.

The barrier is ``multihost_utils.sync_global_devices`` — a zero-payload
collective over the global device set; state moves through the filesystem
(pod-slice NFS / GCS fuse), not DCN, because each host needs only its
problems' source views and the maps are small (< 4 MB each at the 800 px
pyramid base).

Single-process (process_count==1) degenerates to SceneRunner exactly, which
is how tests cover the partitioning logic.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax

from ..config import PMStatic, SceneConfig
from ..sched.runner import SceneRunner


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (TPU pods auto-detect all three args)."""
    if jax.process_count() > 1 or coordinator is None:
        return  # already initialized or single-host auto mode
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def host_problems(problems, process_index: Optional[int] = None,
                  process_count: Optional[int] = None):
    """The subset of problems this host owns (strided for load balance —
    pair.txt orders views by capture sequence, so neighboring problems have
    similar cost)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [p for i, p in enumerate(problems) if i % pc == pi]


class MultiHostRunner(SceneRunner):
    """SceneRunner that owns a host's problem slice and syncs state through
    the shared checkpoint directory between passes."""

    def __init__(self, scene, config: Optional[SceneConfig] = None,
                 base_static: Optional[PMStatic] = None,
                 checkpoint_dir: Optional[Path] = None,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None, **kw):
        super().__init__(scene, config, base_static, **kw)
        self._all_problems = list(scene.problems)
        self._pi = (jax.process_index() if process_index is None
                    else process_index)
        self._pc = (jax.process_count() if process_count is None
                    else process_count)
        self.scene.problems = host_problems(self._all_problems,
                                            self._pi, self._pc)
        self._sync_dir = Path(checkpoint_dir) if checkpoint_dir else None
        # foreign-view sync rewrites self.state between passes, so the
        # batched device-resident shortcut must re-read host state each pass
        self._sync_each_pass = True

    # SceneRunner.run() calls run_view_pass per owned problem, then
    # checkpoint(); we write only owned views, barrier, pull foreign views.
    def checkpoint(self, out_root: Path, view_ids=None) -> None:
        if view_ids is None:
            view_ids = sorted(p.ref_image_id for p in self.scene.problems)
        super().checkpoint(out_root, view_ids)
        self._sync_foreign_views(out_root)

    def _sync_foreign_views(self, out_root: Path) -> None:
        if self._pc == 1:
            return
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("dvpmvs_pass_barrier")
        # pull the source views owned by other hosts into self.state so the
        # next geometric pass reads current depths (APD.cpp:1147-1166)
        owned = {p.ref_image_id for p in self.scene.problems}
        needed = {s for p in self.scene.problems
                  for s in p.src_image_ids} - owned
        self._load_views(out_root, sorted(needed))

    def _load_views(self, out_root: Path, view_ids) -> None:
        import numpy as np

        from ..io import read_bin_mat
        from ..io.scene import format_index
        from ..sched.runner import ViewState

        for rid in view_ids:
            d = out_root / format_index(rid)
            if not (d / "depths.dmb").exists():
                continue
            bits = read_bin_mat(d / "selected_views.bin").astype(np.int32)
            V = max(1, int(bits.max()).bit_length())
            self.state[rid] = ViewState(
                depth=read_bin_mat(d / "depths.dmb").astype(np.float32),
                normal_world=read_bin_mat(
                    d / "APD_normals.dmb").astype(np.float32),
                weak=read_bin_mat(d / "weak.bin").astype(np.int8),
                sel_views=np.stack([(bits >> v) & 1 for v in range(V)],
                                   axis=-1).astype(bool),
                radius=read_bin_mat(d / "radius.bin").astype(np.float32))

    # ------------------------------------------------------------------
    # Collective (DCN) state exchange — the filesystem-free alternative:
    # each host packs its owned views' post-pass state into one fixed-shape
    # array and the hosts all-gather it (jax process_allgather rides
    # ICI within a slice and DCN across slices).  Depth maps at the 800 px
    # pyramid base are < 2 MB/view, so one gather per pass moves a few MB.
    def _pack_state(self):
        """Pack this host's owned post-pass view states into fixed-shape
        arrays (ids [max_owned], pack [max_owned, 8, H, W]) suitable for an
        all-gather.  Channels: depth, nx, ny, nz, weak, selbits, radius."""
        import numpy as np

        owned = sorted(p.ref_image_id for p in self.scene.problems
                       if p.ref_image_id in self.state)
        max_owned = -(-len(self._all_problems) // self._pc)
        any_st = self.state[owned[0]]
        H, W = any_st.depth.shape
        pack = np.zeros((max_owned, 8, H, W), np.float32)
        ids = np.full((max_owned,), -1, np.int32)
        for i, rid in enumerate(owned):
            st = self.state[rid]
            ids[i] = rid
            pack[i, 0] = st.depth
            pack[i, 1:4] = np.moveaxis(st.normal_world, -1, 0)
            pack[i, 4] = st.weak
            bits = np.zeros((H, W), np.float32)
            for v in range(st.sel_views.shape[-1]):
                bits += st.sel_views[..., v].astype(np.float32) * (1 << v)
            pack[i, 5] = bits
            pack[i, 6] = st.radius
        return ids, pack

    def _unpack_foreign(self, all_ids, all_pack, num_views: int) -> None:
        """Install gathered foreign view states (inverse of _pack_state)."""
        import numpy as np

        from ..sched.runner import ViewState

        owned = {p.ref_image_id for p in self.scene.problems}
        all_ids = np.asarray(all_ids).reshape(-1)
        H, W = np.asarray(all_pack).shape[-2:]
        all_pack = np.asarray(all_pack).reshape(-1, 8, H, W)
        for rid, pk in zip(all_ids, all_pack):
            if rid < 0 or int(rid) in owned:
                continue
            bits = pk[5].astype(np.int64)
            self.state[int(rid)] = ViewState(
                depth=pk[0],
                normal_world=np.moveaxis(pk[1:4], 0, -1),
                weak=pk[4].astype(np.int8),
                sel_views=np.stack([(bits >> v) & 1
                                    for v in range(num_views)],
                                   -1).astype(bool),
                radius=pk[6])

    def exchange_state_collective(self) -> None:
        if self._pc == 1:
            return
        from jax.experimental import multihost_utils

        ids, pack = self._pack_state()
        owned = sorted(p.ref_image_id for p in self.scene.problems
                       if p.ref_image_id in self.state)
        V = self.state[owned[0]].sel_views.shape[-1]
        all_ids = multihost_utils.process_allgather(ids)
        all_pack = multihost_utils.process_allgather(pack)
        self._unpack_foreign(all_ids, all_pack, V)

    def run_schedule_pass(self, round_idx: int, pass_idx: int, key) -> None:
        super().run_schedule_pass(round_idx, pass_idx, key)
        if self._sync_dir is None:
            # no shared filesystem: exchange state over the interconnect
            self.exchange_state_collective()
