import numpy as np
import pytest

from pct_tpu.mesh.boundary import boundary_edges
from pct_tpu.mesh.reconstruct import ball_pivoting, bpa_radii, cleanup_mesh
from tests.test_mesh import icosphere


@pytest.fixture(scope="module")
def sphere():
    v, f = icosphere(3)
    nrm = v / np.linalg.norm(v, axis=1, keepdims=True)
    return v, nrm, f


def test_bpa_icosphere_watertight(sphere):
    v, nrm, f_true = sphere
    from scipy.spatial import cKDTree

    d, _ = cKDTree(v).query(v, k=2)
    dbar = d[:, 1].mean()
    faces = cleanup_mesh(ball_pivoting(v, nrm, [1.2 * dbar, 2 * dbar,
                                                4 * dbar]))
    assert faces.shape[0] == f_true.shape[0]      # exact triangulation
    assert boundary_edges(faces).size == 0        # watertight
    used = np.zeros(len(v), bool)
    used[faces.ravel()] = True
    assert used.all()


def test_bpa_torus_sample():
    from scipy.spatial import cKDTree

    from pct_tpu.shapes import generate_shape

    pts, _ = generate_shape("torus", 3000, radius=1.0)
    # analytic torus normals
    rho = np.hypot(pts[:, 0], pts[:, 1])
    ax = np.stack([pts[:, 0] / rho, pts[:, 1] / rho, np.zeros(len(pts))], 1)
    nrm = pts - ax
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    d, _ = cKDTree(pts).query(pts, k=2)
    dbar = d[:, 1].mean()
    faces = cleanup_mesh(ball_pivoting(pts, nrm, bpa_radii(dbar, 5)))
    used = np.zeros(len(pts), bool)
    used[faces.ravel()] = True
    assert used.mean() > 0.97
    # area close to the analytic torus area 4π²·R·r ≈ 13.16
    import jax.numpy as jnp

    from pct_tpu.mesh.energies import triangle_areas

    area = float(np.asarray(
        triangle_areas(jnp.asarray(pts), jnp.asarray(faces))).sum())
    assert np.isclose(area, 4 * np.pi**2 / 3, rtol=0.12)


def test_cleanup_mesh():
    f = np.array([[0, 1, 2], [0, 1, 1], [2, 1, 0], [3, 4, 5]], np.int32)
    out = cleanup_mesh(f)
    assert out.shape[0] == 2   # degenerate + duplicate removed


def test_mesh_pipeline_end_to_end():
    from pct_tpu.pipeline.mesh_pipeline import create_mesh_with_curvature
    from pct_tpu.shapes import generate_shape

    pts, _ = generate_shape("sphere", 3000, radius=1.0)
    res = create_mesh_with_curvature(pts, k_neighbors=16, num_radii=4,
                                     smooth_iterations=5)
    assert res.faces.shape[0] > 4000
    # unit sphere: area 4π, bending ≈ 4π, stretching ≈ 4π
    assert np.isclose(res.energies.total_area, 4 * np.pi, rtol=0.1)
    assert np.isclose(res.energies.bending, 4 * np.pi, rtol=0.25)
    assert np.isclose(res.energies.stretching, 4 * np.pi, rtol=0.25)
