import numpy as np
import pytest

from pct_tpu.utils.filters import (
    filter_outliers_absolute,
    filter_outliers_median,
    running_mean_outlier,
)
from pct_tpu.utils.transforms import rotate_point_cloud


def test_running_mean_outlier():
    x = np.zeros(50)
    x[1:50:2] = 0.01 * np.arange(25)   # smooth-ish
    x[30] = 100.0                      # spike
    out = running_mean_outlier(x, window=10)
    assert abs(out[30]) < 1.0
    # compat mode: only the first iteration runs (reference bug semantics)
    out_c = running_mean_outlier(x, window=10, compat_first_iteration=True)
    assert out_c[30] == 100.0


def test_filter_outliers_median():
    x = np.ones(100)
    x[10] = 1e6
    out = filter_outliers_median(x, threshold=100.0)
    # MAD of constant data is 0 -> early return keeps data unchanged
    assert out[10] == 1e6
    x = np.random.default_rng(0).standard_normal(100)
    x[10] = 1e6
    out = filter_outliers_median(x, threshold=100.0)
    assert abs(out[10]) < 10


def test_filter_outliers_absolute():
    x = np.array([1.0, -200.0, 3.0])
    out = filter_outliers_absolute(x, 100.0)
    assert np.isnan(out[1]) and out[0] == 1.0


def test_rotate_point_cloud_identity():
    pts = np.random.default_rng(0).standard_normal((100, 3)).astype(np.float32)
    out = rotate_point_cloud(pts, 0, 0, 0, lexsort=False)
    np.testing.assert_allclose(out, pts, atol=1e-6)


def test_rotate_point_cloud_preserves_shape():
    pts = np.random.default_rng(0).standard_normal((100, 3)).astype(np.float32)
    out = rotate_point_cloud(pts, 0.3, -0.2, 0.7)
    # rigid transform: pairwise distances from centroid preserved
    r_in = np.sort(np.linalg.norm(pts - pts.mean(0), axis=1))
    r_out = np.sort(np.linalg.norm(out - out.mean(0), axis=1))
    np.testing.assert_allclose(r_in, r_out, rtol=1e-5)
    # compat mode differs from fixed mode when angle_z != angle_y
    a = rotate_point_cloud(pts, 0.1, 0.2, 0.9)
    b = rotate_point_cloud(pts, 0.1, 0.2, 0.9, compat_z_from_y=True)
    assert not np.allclose(a, b)


def test_rotate_point_cloud_compat_matches_reference_semantics():
    """compat_z_from_y reproduces the reference's exact output: row-vector
    chain centered.dot(Rx).dot(Ry).dot(Rz) with Rz built from the Y angle
    (ref pointCloudToolbox.py:149-156); the swap/lexsort prologue is dead
    code there and must not run."""
    rng = np.random.default_rng(7)
    pts = rng.standard_normal((64, 3)).astype(np.float32)
    ax, ay, az = 0.31, -0.55, 1.2

    def rot(a, axis):
        c, s = np.cos(a), np.sin(a)
        m = {
            "x": [[1, 0, 0], [0, c, -s], [0, s, c]],
            "y": [[c, 0, s], [0, 1, 0], [-s, 0, c]],
            "z": [[c, -s, 0], [s, c, 0], [0, 0, 1]],
        }[axis]
        return np.array(m, dtype=np.float64)

    center = pts.astype(np.float64).mean(0)
    centered = pts.astype(np.float64) - center
    expect = (centered @ rot(ax, "x") @ rot(ay, "y") @ rot(ay, "z")
              + center).astype(np.float32)
    got = rotate_point_cloud(pts, ax, ay, az, compat_z_from_y=True)
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_explicit_demo_signs():
    from pct_tpu.demos.explicit_surfaces_demo import run

    res = run()
    assert res["paraboloid"][0] > 0.5          # K > 0
    assert res["saddle"][0] < -0.5             # K < 0
    assert abs(res["saddle"][1]) < 0.05        # H ≈ 0
    assert abs(res["plane"][0]) < 1e-3
    assert abs(res["monkey_saddle"][0]) < 0.2  # flat at origin


def test_implicit_demo_residuals():
    from pct_tpu.demos.implicit_surfaces_demo import run

    res = run()
    for name in ("sphere", "cylinder", "plane"):
        assert res[name][0] < 1e-3, name       # exact quadrics fit tightly
    assert np.isclose(res["sphere"][1], 1 / 1.5**2, rtol=0.05)
