"""Command-line entry points.

  python -m dvpmvs.cli.run scene <dense_folder> [options]   # run one scene
  python -m dvpmvs.cli.run convert <colmap_dense> <out>     # colmap2mvsnet
  python -m dvpmvs.cli.run synth <out_folder>               # demo scene

Replaces the reference's two-positional-arg CLI (main.cpp:421-434) with a
real config surface (SURVEY §5: the reference's dataset switches are code
edits; here they are flags).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def _cmd_scene(args) -> int:
    from ..config import PMStatic, SceneConfig
    from ..fusion import run_fusion
    from ..io import load_scene
    from ..sched import SceneRunner

    scene = load_scene(args.dense_folder, max_src_views=args.max_src_views,
                       load_colors=True)
    cfg = SceneConfig(
        dense_folder=str(args.dense_folder),
        max_base_size=args.max_base_size,
        geometric_passes=args.geometric_passes,
        fusion_variant=args.fusion,
        full_res_round=args.full_res_round,
        mesh_views=args.mesh_views,
        mesh_tiles=args.mesh_tiles,
        seed=args.seed,
    )
    base = PMStatic(
        max_iterations=args.iterations,
        use_edge=not args.no_edge,
        use_label=not args.no_label,
        use_radius=not args.no_radius,
        cost_backend=args.backend,
        debug_dumps=args.debug_dumps,
    )

    mono_planes = {}
    if args.mono_prior:
        import numpy as np
        from ..io.dmb import read_dmb
        from ..priors.mono import mono_prior_planes, read_sfm_txt

        dense = Path(args.dense_folder)
        for p in scene.problems:
            dep_path = dense / "dep" / f"{p.ref_image_id:08d}.dmb"
            sfm_path = dense / "sfm" / f"{p.ref_image_id:08d}.txt"
            if dep_path.exists() and sfm_path.exists():
                xy, xyz, _ = read_sfm_txt(sfm_path)
                mono_planes[p.ref_image_id] = mono_prior_planes(
                    read_dmb(dep_path), xy, xyz,
                    scene.cameras[p.ref_image_id],
                    target_hw=scene.images[p.ref_image_id].shape)

    out_dir = Path(args.output or (Path(args.dense_folder) / "APD"))
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg.output_folder = str(out_dir)
    cfg.show_medium_result = args.show_medium_result
    runner = SceneRunner(scene, cfg, base_static=base,
                         mono_planes=mono_planes)
    runner.run(checkpoint_dir=out_dir if (args.checkpoint or args.resume)
               else None,
               resume=args.resume, profile_dir=args.profile_dir)
    if args.metrics:
        runner.metrics.dump(out_dir / "metrics.json")
    pts, _ = run_fusion(runner.fusion_inputs(), variant=args.fusion,
                        out_ply=str(out_dir / "APD.ply"))
    print(f"fused {len(pts)} points -> {out_dir / 'APD.ply'}")
    return 0


def _cmd_prior(args) -> int:
    """Generate ``dep/%08d.dmb`` monocular-depth priors for a scene by
    running Depth-Anything-V2 natively (JAX/Flax ViT) — the maps the
    reference expects precomputed on disk (APD.cpp:1219-1223)."""
    import numpy as np

    from ..io import load_scene
    from ..io.dmb import write_depth_dmb
    from ..priors.depth_anything import (DAConfig, infer_relative_depth,
                                         init_params)

    scene = load_scene(args.dense_folder, max_src_views=1)
    if args.checkpoint:
        from ..priors.convert import load_torch_checkpoint

        params, cfg = load_torch_checkpoint(args.checkpoint)
    else:
        import jax

        print("[dvpmvs] WARNING: no --checkpoint given; using randomly "
              "initialized DA-V2 weights (shape/pipeline testing only)")
        cfg = DAConfig.tiny_test() if args.tiny else DAConfig.vits()
        params = init_params(jax.random.PRNGKey(args.seed), cfg)

    out_dir = Path(args.dense_folder) / "dep"
    out_dir.mkdir(parents=True, exist_ok=True)
    for vid in scene.image_ids:
        img = scene.images[vid]
        dep = infer_relative_depth(params, np.asarray(img, np.float32), cfg)
        write_depth_dmb(out_dir / f"{vid:08d}.dmb", dep.astype(np.float32))
        print(f"[dvpmvs] dep/{vid:08d}.dmb written")
    return 0


def _cmd_convert(args) -> int:
    from ..io.colmap import convert_colmap

    convert_colmap(args.dense_folder, args.save_folder,
                   model_subdir=args.model_subdir,
                   scale_factor=args.scale_factor, max_d=args.max_d)
    print(f"converted {args.dense_folder} -> {args.save_folder}")
    return 0


def _cmd_synth(args) -> int:
    from ..utils.synthetic import make_scene, write_scene_dir

    scene = make_scene(num_views=args.views, height=args.height,
                       width=args.width, seed=args.seed)
    write_scene_dir(scene, args.out_folder)
    print(f"wrote synthetic scene -> {args.out_folder}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="dvpmvs")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("scene", help="run PatchMatch MVS on a scene")
    ps.add_argument("dense_folder")
    ps.add_argument("--output", default=None)
    ps.add_argument("--fusion", default="eth3d",
                    choices=["eth3d", "tat_intermediate", "tat_advanced"])
    ps.add_argument("--iterations", type=int, default=3)
    ps.add_argument("--geometric-passes", type=int, default=3)
    ps.add_argument("--max-base-size", type=int, default=800)
    ps.add_argument("--max-src-views", type=int, default=20)
    ps.add_argument("--backend", default="pallas",
                    choices=["pallas", "exact", "warp"])
    ps.add_argument("--no-edge", action="store_true")
    ps.add_argument("--no-label", action="store_true")
    ps.add_argument("--no-radius", action="store_true",
                    help="disable the adaptive per-pixel NCC radius")
    ps.add_argument("--mesh-views", type=int, default=1,
                    help="devices along the view axis (batched sharded "
                         "passes when > 1)")
    ps.add_argument("--mesh-tiles", type=int, default=1,
                    help="devices along the image-row axis (Phase-B tile "
                         "sharding of each per-view pass when > 1)")
    ps.add_argument("--full-res-round", action="store_true",
                    help="add the full-resolution round the reference "
                         "schedule stops before (main.cpp:450)")
    ps.add_argument("--mono-prior", action="store_true")
    ps.add_argument("--checkpoint", action="store_true",
                    help="persist per-pass state (reference .dmb/.bin files)")
    ps.add_argument("--resume", action="store_true",
                    help="resume a checkpointed run from its progress cursor")
    ps.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler trace here")
    ps.add_argument("--show-medium-result", action="store_true",
                    help="write per-pass depth/normal/weak jpgs "
                         "(main.cpp:396-403)")
    ps.add_argument("--metrics", action="store_true",
                    help="dump per-pass timings to <output>/metrics.json")
    ps.add_argument("--debug-dumps", action="store_true",
                    help="write per-pass sweep cost curves and anchor lists "
                         "(reference DEBUG_COST_LINE / DEBUG_NEIGHBOUR "
                         "layouts) to each view's result folder")
    ps.add_argument("--seed", type=int, default=0)
    ps.set_defaults(fn=_cmd_scene)

    pp = sub.add_parser("prior", help="run DA-V2 -> dep/%%08d.dmb maps")
    pp.add_argument("dense_folder")
    pp.add_argument("--checkpoint", default=None,
                    help="released DA-V2 .pth (or .npz) to convert and run")
    pp.add_argument("--seed", type=int, default=0)
    pp.add_argument("--tiny", action="store_true",
                    help="tiny random model (pipeline tests)")
    pp.set_defaults(fn=_cmd_prior)

    pc = sub.add_parser("convert", help="COLMAP model -> MVSNet layout")
    pc.add_argument("dense_folder")
    pc.add_argument("save_folder")
    pc.add_argument("--model-subdir", default="sparse")
    pc.add_argument("--scale-factor", type=int, default=1)
    pc.add_argument("--max-d", type=int, default=192)
    pc.set_defaults(fn=_cmd_convert)

    py = sub.add_parser("synth", help="write a synthetic demo scene")
    py.add_argument("out_folder")
    py.add_argument("--views", type=int, default=5)
    py.add_argument("--height", type=int, default=192)
    py.add_argument("--width", type=int, default=256)
    py.add_argument("--seed", type=int, default=0)
    py.set_defaults(fn=_cmd_synth)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
