import numpy as np
import pytest

from pct_tpu.shapes import (
    SHAPES,
    analytic_area,
    analytic_curvatures,
    analytic_energies,
    generate_shape,
)


@pytest.mark.parametrize("shape", SHAPES)
def test_generators_shapes(shape):
    pts, pert = generate_shape(shape, 5000, radius=2.0)
    assert pts.shape == (5000, 3) and pts.dtype == np.float32
    np.testing.assert_allclose(pts, pert)  # no perturbation by default


def test_sphere_on_sphere():
    pts, _ = generate_shape("sphere", 3000, radius=2.5)
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r, 2.5, rtol=1e-5)


def test_cylinder_radius():
    pts, _ = generate_shape("cylinder", 3000, radius=3.0)
    rho = np.linalg.norm(pts[:, :2], axis=1)
    np.testing.assert_allclose(rho, 3.0, rtol=1e-5)
    assert pts[:, 2].min() >= -3.0 - 1e-4 and pts[:, 2].max() <= 3.0 + 1e-4


def test_torus_on_torus():
    pts, _ = generate_shape("torus", 4000, radius=2.0)
    rho = np.linalg.norm(pts[:, :2], axis=1)
    tube = np.sqrt((rho - 2.0) ** 2 + pts[:, 2] ** 2)
    np.testing.assert_allclose(tube, 2.0 / 3.0, rtol=1e-4)


def test_perturbation_nonzero():
    pts, pert = generate_shape("sphere", 1000, radius=1.0,
                               perturbation_strength=0.01)
    assert not np.allclose(pts, pert)
    assert np.abs(pert - pts).max() < 0.2


@pytest.mark.parametrize("shape,expected", [
    ("sphere", 4 * np.pi * 4.0),
    ("cylinder", 4 * np.pi * 4.0),
    ("torus", 4 * np.pi**2 * 2.0 * (2.0 / 3.0)),
])
def test_areas_closed_form(shape, expected):
    assert np.isclose(analytic_area(shape, 2.0), expected, rtol=1e-12)


def test_egg_area_reasonable():
    a = analytic_area("egg_carton", 1.0)
    assert 4.0 < a < 4.5  # slightly more than the flat 2x2 square


def test_energies():
    b, s = analytic_energies("sphere")
    assert np.isclose(b, 4 * np.pi) and np.isclose(s, 4 * np.pi)
    b, s = analytic_energies("cylinder")
    assert np.isclose(b, np.pi) and s == 0.0
    b, s = analytic_energies("torus", 5.0)
    assert np.isclose(b, 9 * np.pi**2 / np.sqrt(8.0)) and s == 0.0
    b, s = analytic_energies("egg_carton")
    assert s == pytest.approx(0.0, abs=1e-6)  # Gauss-Bonnet: flat boundary


def test_torus_pointwise_curvature_gauss_bonnet():
    # crude Monte-Carlo check that K integrates to ~0 over the torus
    pts, _ = generate_shape("torus", 250000, radius=1.0)
    K, H = analytic_curvatures("torus", pts, radius=1.0)
    # at phi=0 (outer equator): K = 1/(rt*(R+rt)), H = (R+2rt)/(2rt(R+rt))
    rt, R = 1 / 3, 1.0
    outer = np.argmax(np.linalg.norm(pts[:, :2], axis=1))
    assert np.isclose(K[outer], 1 / (rt * (R + rt)), rtol=1e-2)
    assert np.isclose(H[outer], (R + 2 * rt) / (2 * rt * (R + rt)), rtol=1e-2)


def test_sphere_curvature_values():
    pts, _ = generate_shape("sphere", 100, radius=2.0)
    K, H = analytic_curvatures("sphere", pts, radius=2.0)
    np.testing.assert_allclose(K, 0.25)
    np.testing.assert_allclose(H, 0.5)
