import jax.numpy as jnp
import numpy as np

from pct_tpu.curvature import (
    explicit_curvatures,
    implicit_curvatures,
    pca_principal_curvatures,
    surface_variation,
)


def test_explicit_paraboloid():
    # z = (x² + y²)/2 -> K = 1, H = 1, k1 = k2 = 1 at origin
    c = jnp.asarray([[0.5, 0.5, 0.0, 0.0, 0.0, 0.0]], dtype=jnp.float32)
    r = explicit_curvatures(c)
    np.testing.assert_allclose(np.asarray(r.K), [1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.H), [1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.k1), [1.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(r.k2), [1.0], atol=1e-3)


def test_explicit_saddle():
    # z = (x² - y²)/2 -> K = -1, H = 0, k1/k2 = ±1
    c = jnp.asarray([[0.5, -0.5, 0.0, 0.0, 0.0, 0.0]], dtype=jnp.float32)
    r = explicit_curvatures(c)
    np.testing.assert_allclose(np.asarray(r.K), [-1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.H), [0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.k1), [1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.k2), [-1.0], atol=1e-6)


def test_explicit_tilted_plane():
    # z = 0.3x + 0.4y -> flat: K = H = 0
    c = jnp.asarray([[0.0, 0.0, 0.0, 0.3, 0.4, 0.0]], dtype=jnp.float32)
    r = explicit_curvatures(c)
    np.testing.assert_allclose(np.asarray(r.K), [0.0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(r.H), [0.0], atol=1e-7)


def test_explicit_discriminant_clamp():
    # slope makes H²-K slightly negative numerically; k1/k2 stay finite
    c = jnp.asarray([[0.5, 0.5, 0.0, 1.0, -1.0, 0.0]], dtype=jnp.float32)
    r = explicit_curvatures(c)
    assert np.isfinite(np.asarray(r.k1)).all()
    assert np.isfinite(np.asarray(r.k2)).all()


def test_implicit_exact_sphere():
    # sphere through origin, center (0,0,r): x²+y²+z² - 2rz = 0
    r = 2.0
    c = np.array([[1, 1, 1, 0, 0, 0, 0, 0, -2 * r, 0]], dtype=np.float32)
    c /= np.linalg.norm(c)
    res = implicit_curvatures(jnp.asarray(c), mode="exact")
    np.testing.assert_allclose(np.asarray(res.K), [1 / r**2], rtol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(res.H)), [1 / r], rtol=1e-5)
    # K invariant under global coefficient sign flip
    res2 = implicit_curvatures(jnp.asarray(-c), mode="exact")
    np.testing.assert_allclose(np.asarray(res2.K), np.asarray(res.K), rtol=1e-6)


def test_implicit_reference_mode_formula():
    # bit-faithful check of the reference's (nonstandard) K_g = det(H)/|g|⁴
    c = np.array([[1, 1, 1, 0, 0, 0, 0, 0, -4.0, 0]], dtype=np.float32)
    res = implicit_curvatures(jnp.asarray(c), mode="reference")
    hess = np.diag([2.0, 2.0, 2.0])
    g = np.array([0, 0, -4.0])
    expect_K = np.linalg.det(hess) / np.linalg.norm(g) ** 4
    np.testing.assert_allclose(np.asarray(res.K), [expect_K], rtol=1e-5)
    # unclamped discriminant: H² - K < 0 -> NaN preserved (ref :477-478)
    H = float(np.asarray(res.H)[0])
    if H * H < expect_K:
        assert np.isnan(np.asarray(res.k1)).all()


def test_implicit_exact_cylinder():
    # cylinder x² + y² - 2rx = 0 through origin (axis along z at (r,0)):
    # K = 0, |H| = 1/(2r)
    r = 1.5
    c = np.array([[1, 1, 0, 0, 0, 0, -2 * r, 0, 0, 0]], dtype=np.float32)
    c /= np.linalg.norm(c)
    res = implicit_curvatures(jnp.asarray(c), mode="exact")
    np.testing.assert_allclose(np.asarray(res.K), [0.0], atol=1e-6)
    np.testing.assert_allclose(np.abs(np.asarray(res.H)), [1 / (2 * r)],
                               rtol=1e-5)


def _sphere_points(n, r, rng):
    v = rng.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * r).astype(np.float32)


def test_pca_proxies(rng):
    pts = _sphere_points(500, 1.0, rng)
    from scipy.spatial import cKDTree

    _, idx = cKDTree(pts).query(pts, k=11)
    idx = jnp.asarray(idx[:, 1:].astype(np.int32))
    res = pca_principal_curvatures(jnp.asarray(pts), idx)
    assert np.all(np.asarray(res.k1) >= np.asarray(res.k2))
    assert np.all(np.asarray(res.k2) >= -1e-7)
    sv = np.asarray(surface_variation(jnp.asarray(pts), idx))
    assert np.all(sv >= 0) and np.all(sv < 0.2)  # near-planar patches
