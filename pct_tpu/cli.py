"""Unified CLI — replaces the reference's edit-the-file script drivers
(SURVEY §5 "Config / flag system — none") with real subcommands:

  pct-tpu sweep        analytic-shape validation sweep  (main_shape_validation.py)
  pct-tpu scans        batch-validate real scans        (main_scans.py)
  pct-tpu curvature    one cloud -> curvature-colored PLY
  pct-tpu convert      .asc -> .ply with voxel downsample (convert_asc_to_ply.py)
  pct-tpu downsample   voxel-downsample clouds           (downsample.py)
  pct-tpu strip-normals remove normals from a PLY        (ply_remove_normals.py)
  pct-tpu view-figs    open/export pickled figures       (view_figs.py)
  pct-tpu view-meshes  render meshes                     (view_meshes.py)
  pct-tpu plot-results sweep CSV analysis plots          (plot_shape_validation_results.py)
  pct-tpu bench        run the 1M-point benchmark

Run as `python -m pct_tpu.cli <cmd> ...`.
"""

from __future__ import annotations

import argparse
import sys


def _cmd_curvature(args):
    import numpy as np

    from pct_tpu.core import from_numpy
    from pct_tpu.io import load_points, write_ply
    from pct_tpu.pipeline import curvature_pipeline

    pts, _ = load_points(args.input)
    cloud = from_numpy(pts)
    r = curvature_pipeline(cloud, k=args.k, method=args.method)
    n = int(cloud.num_points)
    K = np.asarray(r.curv.K)[:n]
    H = np.asarray(r.curv.H)[:n]
    write_ply(args.output, pts, np.asarray(r.normals)[:n],
              vertex_props={"gaussian_curvature": K, "mean_curvature": H})
    print(f"{args.input}: {n} points -> {args.output} "
          f"(K median {np.nanmedian(K):.4g}, H median {np.nanmedian(H):.4g})")


def _cmd_convert(args):
    from pct_tpu.io import convert_asc_to_ply

    n = convert_asc_to_ply(args.input, args.output, args.voxel_size)
    print(f"{args.input} -> {args.output} ({n} points)")


def _cmd_downsample(args):
    import jax.numpy as jnp
    import numpy as np

    from pct_tpu.core import from_numpy
    from pct_tpu.io import load_points, write_ply
    from pct_tpu.mesh.downsample import voxel_downsample

    pts, _ = load_points(args.input)
    cloud = from_numpy(pts)
    out, kept = voxel_downsample(cloud.points, cloud.num_points,
                                 jnp.float32(args.voxel_size),
                                 max_per_voxel=args.max_per_voxel,
                                 mode=args.mode)
    kept = int(kept)
    write_ply(args.output, np.asarray(out)[:kept])
    print(f"{args.input}: {int(cloud.num_points)} -> {kept} points")


def _cmd_strip(args):
    from pct_tpu.io import strip_normals

    strip_normals(args.input, args.output)
    print(f"{args.input} -> {args.output}")


def _cmd_view_figs(args):
    from pct_tpu.viz import view_figs

    paths = view_figs(args.dir, show=not args.export,
                      export_dir=args.export)
    print(f"{len(paths)} figures")


def _cmd_view_meshes(args):
    from pct_tpu.viz import view_meshes

    paths = view_meshes(args.dir, pattern=args.pattern, show=not args.headless)
    print(f"{len(paths)} meshes")


def _cmd_plot_results(args):
    from pct_tpu.viz import load_results, plot_curvature_histograms, plot_error_scatter

    rows = load_results(args.csv)
    plot_error_scatter(rows, args.out)
    if args.curvature_dir:
        plot_curvature_histograms(args.curvature_dir, args.out)
    print(f"{len(rows)} rows plotted -> {args.out}")


def _cmd_reconstruct(args):
    from pct_tpu.io import load_points
    from pct_tpu.pipeline.mesh_pipeline import create_mesh_with_curvature

    pts, _ = load_points(args.input)
    m = create_mesh_with_curvature(pts, k_neighbors=args.k,
                                   smooth_iterations=args.smooth,
                                   save_mesh_path=args.output)
    e = m.energies
    print(f"{args.input}: {len(pts)} points -> {args.output} "
          f"({len(m.faces)} faces, {m.n_holes_filled} holes filled, "
          f"area {e.total_area:.4g}, bending {e.bending:.4g}, "
          f"stretching {e.stretching:.4g})")


def _cmd_bench(args):
    # bench.py lives at the repo root (driver contract), not in the
    # package — make the import location-independent
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    bench.main()


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from pct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()   # tunneled-TPU compiles cost minutes
    # sweep/scans own their full option set — delegate before argparse
    # (argparse.REMAINDER cannot capture option-like tokens reliably)
    if argv and argv[0] == "sweep":
        from pct_tpu.validate import sweep

        return sweep.main(argv[1:])
    if argv and argv[0] == "scans":
        from pct_tpu.validate import scans

        return scans.main(argv[1:])

    p = argparse.ArgumentParser(prog="pct-tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("sweep", help="analytic-shape validation sweep")
    sub.add_parser("scans", help="batch-validate real scans")

    sp = sub.add_parser("curvature")
    sp.add_argument("input")
    sp.add_argument("output")
    sp.add_argument("--k", type=int, default=20)
    sp.add_argument("--method", choices=["explicit", "implicit"],
                    default="explicit")
    sp.set_defaults(fn=_cmd_curvature)

    sp = sub.add_parser("convert")
    sp.add_argument("input")
    sp.add_argument("output")
    sp.add_argument("--voxel-size", type=float, default=None)
    sp.set_defaults(fn=_cmd_convert)

    sp = sub.add_parser("downsample")
    sp.add_argument("input")
    sp.add_argument("output")
    sp.add_argument("--voxel-size", type=float, required=True)
    sp.add_argument("--max-per-voxel", type=int, default=1)
    sp.add_argument("--mode", choices=["first", "centroid"], default="first")
    sp.set_defaults(fn=_cmd_downsample)

    sp = sub.add_parser("strip-normals")
    sp.add_argument("input")
    sp.add_argument("output")
    sp.set_defaults(fn=_cmd_strip)

    sp = sub.add_parser("view-figs")
    sp.add_argument("dir")
    sp.add_argument("--export", default=None)
    sp.set_defaults(fn=_cmd_view_figs)

    sp = sub.add_parser("view-meshes")
    sp.add_argument("dir")
    sp.add_argument("--pattern", default="*.ply")
    sp.add_argument("--headless", action="store_true")
    sp.set_defaults(fn=_cmd_view_meshes)

    sp = sub.add_parser("plot-results")
    sp.add_argument("csv")
    sp.add_argument("--out", default="plots")
    sp.add_argument("--curvature-dir", default=None)
    sp.set_defaults(fn=_cmd_plot_results)

    sp = sub.add_parser("reconstruct", help="mesh a cloud (BPA pipeline) "
                        "-> .ply/.vtk with curvature scalars")
    sp.add_argument("input")
    sp.add_argument("output")
    sp.add_argument("--k", type=int, default=20)
    sp.add_argument("--smooth", type=int, default=10)
    sp.set_defaults(fn=_cmd_reconstruct)

    sp = sub.add_parser("bench")
    sp.set_defaults(fn=_cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
