import os
import pickle

import numpy as np
import pytest

from pct_tpu.shapes import generate_shape
from pct_tpu.viz import (
    load_results,
    plot_error_scatter,
    plot_points_colored_by_curvature,
    plot_surface,
    view_figs,
    visualize_knn_for_random_points,
)


@pytest.fixture(scope="module")
def small_cloud():
    pts, _ = generate_shape("sphere", 500, radius=1.0)
    return pts


def test_plot_curvature_figures(tmp_path, small_cloud):
    K = np.ones(500)
    H = np.ones(500)
    plot_points_colored_by_curvature(small_cloud, K, H, str(tmp_path))
    names = {p.name for p in tmp_path.iterdir()}
    assert "points_by_gaussian_curvature.pickle" in names
    assert "points_by_mean_curvature.png" in names
    # pickled figures must unpickle (reference viewer contract)
    with open(tmp_path / "points_by_gaussian_curvature.pickle", "rb") as f:
        fig = pickle.load(f)
    assert fig is not None


def test_knn_plot_and_viewer(tmp_path, small_cloud):
    idx = np.tile(np.arange(10), (500, 1))
    visualize_knn_for_random_points(small_cloud, idx, str(tmp_path))
    plot_surface(small_cloud, str(tmp_path))
    out = tmp_path / "export"
    paths = view_figs(str(tmp_path), show=False, export_dir=str(out))
    assert len(paths) == 2
    assert len(list(out.iterdir())) == 2


def test_cli_convert_downsample_strip(tmp_path, small_cloud, rng):
    from pct_tpu.cli import main

    asc = tmp_path / "scan.asc"
    np.savetxt(asc, np.hstack([small_cloud,
                               rng.standard_normal((500, 3))]))
    ply = tmp_path / "scan.ply"
    main(["convert", str(asc), str(ply), "--voxel-size", "0.2"])
    assert ply.exists()

    down = tmp_path / "down.ply"
    main(["downsample", str(ply), str(down), "--voxel-size", "0.5"])
    assert down.exists()

    from pct_tpu.io import read_ply, write_ply

    withn = tmp_path / "with_normals.ply"
    write_ply(str(withn), small_cloud, rng.standard_normal((500, 3)))
    stripped = tmp_path / "stripped.ply"
    main(["strip-normals", str(withn), str(stripped)])
    assert read_ply(str(stripped)).normals is None


def test_cli_curvature(tmp_path, small_cloud):
    from pct_tpu.cli import main
    from pct_tpu.io import read_ply, write_ply

    inp = tmp_path / "in.ply"
    write_ply(str(inp), small_cloud)
    out = tmp_path / "out.ply"
    main(["curvature", str(inp), str(out), "--k", "12"])
    d = read_ply(str(out))
    assert "gaussian_curvature" in d.vertex_props
    assert np.isfinite(d.vertex_props["gaussian_curvature"]).all()


def test_plot_results_roundtrip(tmp_path):
    from pct_tpu.validate.sweep import run_sweep

    csv_path = tmp_path / "r.csv"
    run_sweep([2000], [1.0], ["sphere"], out_csv=str(csv_path),
              backup_csv=None, k_neighbors=12)
    rows = load_results(str(csv_path))
    assert len(rows) == 1
    plot_error_scatter(rows, str(tmp_path / "plots"))
    assert (tmp_path / "plots" / "area_error_pct.png").exists()
