"""The reference-compat façade must expose the reference's names and
behave sanely end-to-end."""

import numpy as np
import pytest

from pct_tpu import compat
from pct_tpu.shapes import generate_shape


@pytest.fixture(scope="module")
def sphere_pc():
    pts, _ = generate_shape("sphere", 2000, radius=1.0)
    return compat.PointCloud(points=pts, k_neighbors=16)


def test_ctor_norms(sphere_pc):
    """Reference computes np.linalg.norm on the (N,3) MATRIX (ref :43-47):
    l1 = max column abs-sum, l2 = spectral norm, linf = max row abs-sum."""
    assert sphere_pc.num_points == 2000
    p = sphere_pc.points.astype(np.float64)
    assert np.isclose(sphere_pc.l1_norm, np.linalg.norm(p, 1), rtol=1e-6)
    assert np.isclose(sphere_pc.l2_norm, np.linalg.norm(p, 2), rtol=1e-6)
    assert np.isclose(sphere_pc.linf_norm, np.linalg.norm(p, np.inf),
                      rtol=1e-6)
    # sanity: a unit sphere's spectral norm ≈ sqrt(N/3), NOT sqrt(N)
    assert np.isclose(sphere_pc.l2_norm, np.sqrt(2000 / 3), rtol=0.05)


def test_plant_kdtree_and_explicit_chain(sphere_pc):
    idx, dists = sphere_pc.plant_kdtree(16)
    assert idx.shape == (2000, 16) and dists.shape == (2000, 16)
    K, H = sphere_pc.compute_pointwise_explicit_quadratic_curvature()
    assert np.isclose(np.median(K), 1.0, rtol=0.05)
    assert np.isclose(np.median(H), 1.0, rtol=0.05)
    assert sphere_pc.quadratic_coefficients.shape[1] == 6


def test_implicit_chain(sphere_pc):
    K, H = sphere_pc.compute_pointwise_implicit_quadric_curvature()
    assert np.isclose(np.median(K[:2000]), 1.0, rtol=0.1)


def test_pca_and_study(sphere_pc):
    k1, k2 = sphere_pc.principal_curvatures_via_principal_component_analysis(12)
    assert (k1[:2000] >= k2[:2000] - 1e-7).all()
    k_rec = sphere_pc.explicit_quadratic_neighbor_study(tolerance=1e-3,
                                                        sample_size=32)
    assert 1 <= k_rec <= 100


def test_energies_static():
    b, s = compat.PointCloud.calculate_energies([1.0, 2.0], [1.0, 1.0],
                                                [2.0, 3.0])
    assert b == 1 * 4 + 2 * 9 and s == 3.0


def test_export_and_downsample(tmp_path, sphere_pc):
    p = tmp_path / "out.ply"
    sphere_pc.export_ply_with_curvature_and_normals(str(p))
    from pct_tpu.io import read_ply

    d = read_ply(str(p))
    assert "gaussian_curvature" in d.vertex_props

    pts, _ = generate_shape("sphere", 1000, radius=1.0)
    pc = compat.PointCloud(points=pts, downsample=True, voxel_size=0.3)
    assert 0 < pc.num_points < 1000   # downsample=True WORKS here


def test_utils_functions(tmp_path):
    pts, _ = generate_shape("torus", 1500, radius=1.0)
    d, radii = compat.average_distance_using_kd_tree(pts)
    assert radii.shape == (25,) and radii[0] < radii[-1]
    sv = compat.estimate_curvature(pts, k_fraction=0.01)
    assert sv.shape == (1500,) and (sv >= 0).all()
    assert compat.get_characteristic_scale(pts) > 1.0
    unpert, pert = compat.generate_pv_shapes("sphere", 500, radius=2.0)
    assert np.allclose(np.linalg.norm(unpert, axis=1), 2.0, rtol=1e-4)
    p = tmp_path / "c.ply"
    compat.save_points_to_ply(pts, str(p))
    back = compat.parse_ply(str(p))
    np.testing.assert_allclose(back, pts, rtol=1e-5, atol=1e-6)


def test_validate_shape_compat(tmp_path):
    pts, _ = generate_shape("sphere", 4000, radius=1.0)
    p = tmp_path / "s.ply"
    compat.save_points_to_ply(pts, str(p))
    b, s, a = compat.validate_shape(str(p), "N", "sphere", "Unperturbed", 1.0,
                                    k_neighbors=16, auto_k=False)
    assert np.isclose(a, 4 * np.pi, rtol=0.12)
    assert np.isclose(b, 4 * np.pi, rtol=0.15)
