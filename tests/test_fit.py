import jax.numpy as jnp
import numpy as np
import pytest

from pct_tpu.fit import (
    eigh3,
    eigvalsh3,
    estimate_normals,
    fit_quadratic,
    fit_quadratic_lstsq_oracle,
    fit_quadric,
    rodrigues_to_z,
    smallest_eigvec3,
    tangent_frames,
)
from pct_tpu.fit.quadric import quadric_design


def random_sym(rng, n):
    A = rng.standard_normal((n, 3, 3)).astype(np.float32)
    return (A + np.transpose(A, (0, 2, 1))) / 2


def test_eigvalsh3_vs_numpy(rng):
    A = random_sym(rng, 200)
    w = np.asarray(eigvalsh3(jnp.asarray(A)))
    wn = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(w, wn, rtol=1e-4, atol=1e-4)


def test_eigh3_reconstruction(rng):
    A = random_sym(rng, 200)
    w, V = eigh3(jnp.asarray(A))
    w, V = np.asarray(w), np.asarray(V)
    # A V = V diag(w)
    AV = np.einsum("nij,njk->nik", A, V)
    VW = V * w[:, None, :]
    np.testing.assert_allclose(AV, VW, atol=5e-4)
    # orthonormal columns
    VtV = np.einsum("nji,njk->nik", V, V)
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape),
                               atol=5e-5)


@pytest.mark.parametrize("diag", [(1, 1, 1), (1, 1, 2), (0, 0, 0), (1, 2, 3)])
def test_eigh3_degenerate(diag):
    A = np.diag(np.array(diag, dtype=np.float32))[None]
    w, V = eigh3(jnp.asarray(A))
    np.testing.assert_allclose(np.sort(np.asarray(w)[0]), np.sort(diag),
                               atol=1e-5)
    VtV = np.asarray(V)[0].T @ np.asarray(V)[0]
    np.testing.assert_allclose(VtV, np.eye(3), atol=1e-5)


def test_smallest_eigvec_plane(rng):
    # points on the plane z = 0.3x - 0.2y -> normal ∝ (-0.3, 0.2, 1)
    xy = rng.standard_normal((50, 2)).astype(np.float32)
    z = 0.3 * xy[:, 0] - 0.2 * xy[:, 1]
    pts = np.stack([xy[:, 0], xy[:, 1], z], axis=1)
    pts -= pts.mean(0)
    cov = (pts.T @ pts / (len(pts) - 1)).astype(np.float32)
    lam, v = smallest_eigvec3(jnp.asarray(cov[None]))
    v = np.asarray(v)[0]
    expected = np.array([-0.3, 0.2, 1.0])
    expected /= np.linalg.norm(expected)
    assert abs(abs(v @ expected) - 1) < 1e-4
    assert float(lam[0]) < 1e-6


def test_rodrigues_rotates_normal_to_z(rng):
    n = rng.standard_normal((100, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    R = np.asarray(rodrigues_to_z(jnp.asarray(n)))
    rotated = np.einsum("nij,nj->ni", R, n)
    # excludes the s≈0 antipodal quirk rows (n ≈ -z -> identity fallback)
    ok = n[:, 2] > -0.9999
    np.testing.assert_allclose(rotated[ok],
                               np.broadcast_to([0, 0, 1.0], rotated[ok].shape),
                               atol=1e-4)


def test_rodrigues_antipodal_quirk():
    # n = -z keeps identity (reference fallback, pointCloudToolbox.py:299-312)
    n = jnp.asarray(np.array([[0.0, 0.0, -1.0]], dtype=np.float32))
    R = np.asarray(rodrigues_to_z(n))[0]
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def _sphere_cap(rng, r=2.0, k=30):
    """Neighborhood on a sphere of radius r around the north pole,
    centered on the pole (query-point centering), sorted by distance."""
    theta = rng.uniform(0, 0.3, k)
    phi = rng.uniform(0, 2 * np.pi, k)
    pts = np.stack([
        r * np.sin(theta) * np.cos(phi),
        r * np.sin(theta) * np.sin(phi),
        r * np.cos(theta) - r,
    ], axis=1).astype(np.float32)
    order = np.argsort(np.linalg.norm(pts, axis=1))
    return pts[order]


def test_estimate_normals_sphere_cap(rng):
    caps = np.stack([_sphere_cap(rng) for _ in range(8)])
    n, lam = estimate_normals(jnp.asarray(caps))
    n = np.asarray(n)
    # sign-fix points the normal toward the far-minus-near reference vector,
    # which on a cap dips inward -> inward normal (negative z here)
    assert np.all(np.abs(n[:, 2]) > 0.99)


def test_fit_quadratic_vs_lstsq(rng):
    # smooth quadratic patches + noise; normal-equations vs SVD lstsq
    coefs = rng.standard_normal((16, 6)).astype(np.float32) * 0.3
    ab = rng.standard_normal((16, 40, 2)).astype(np.float32) * 0.5
    z = (coefs[:, 0, None] * ab[..., 0] ** 2 + coefs[:, 1, None] * ab[..., 1] ** 2
         + coefs[:, 2, None] * ab[..., 0] * ab[..., 1]
         + coefs[:, 3, None] * ab[..., 0] + coefs[:, 4, None] * ab[..., 1]
         + coefs[:, 5, None])
    z = z + rng.standard_normal(z.shape).astype(np.float32) * 1e-3
    rot = np.concatenate([ab, z[..., None]], axis=-1).astype(np.float32)
    c_ne = np.asarray(fit_quadratic(jnp.asarray(rot)))
    c_ls = np.asarray(fit_quadratic_lstsq_oracle(jnp.asarray(rot)))
    np.testing.assert_allclose(c_ne, c_ls, rtol=5e-3, atol=5e-4)
    # exact recovery of the generating coefficients (noise-limited)
    np.testing.assert_allclose(c_ne, coefs, atol=5e-3)


def test_fit_quadratic_tiny_patch_conditioning(rng):
    # patch at scale 1e-3: raw f32 normal equations would be garbage;
    # the unit-radius prescaling must keep recovery accurate
    ab = (rng.standard_normal((4, 30, 2)) * 1e-3).astype(np.float32)
    A, B = 5.0, -3.0  # curvatures of order 1/scale are realistic
    z = A * ab[..., 0] ** 2 + B * ab[..., 1] ** 2
    rot = np.concatenate([ab, z[..., None]], axis=-1).astype(np.float32)
    c = np.asarray(fit_quadratic(jnp.asarray(rot)))
    np.testing.assert_allclose(c[:, 0], A, rtol=1e-2)
    np.testing.assert_allclose(c[:, 1], B, rtol=1e-2)


def test_fit_quadric_sphere(rng):
    # exact quadric data -> fitted c must satisfy design @ c ≈ 0
    caps = np.stack([_sphere_cap(rng, r=1.5, k=40) for _ in range(8)])
    c = fit_quadric(jnp.asarray(caps))
    resid = np.asarray(
        jnp.einsum("nki,ni->nk", quadric_design(jnp.asarray(caps)), c)
    )
    assert np.abs(resid).max() < 1e-4


def test_tangent_frames_shapes(rng):
    nbrs = rng.standard_normal((6, 20, 3)).astype(np.float32)
    rotated, R, n = tangent_frames(jnp.asarray(nbrs))
    assert rotated.shape == (6, 20, 3)
    assert R.shape == (6, 3, 3)
    assert n.shape == (6, 3)
    # R orthonormal
    RtR = np.einsum("nji,njk->nik", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (6, 3, 3)),
                               atol=1e-5)


def test_quadric_inverse_iteration_matches_eigh(rng):
    """The shifted-inverse-iteration smallest eigenvector (default
    solver) recovers the same quadric as the full eigh on both exact
    and noisy neighborhoods — curvature consumers see the same
    coefficients up to the canonical sign."""
    from pct_tpu.fit.quadric import fit_quadric as fq

    pts = rng.standard_normal((512, 24, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)  # unit sphere caps
    for noisy in (0.0, 1e-3):
        p = (pts + noisy * rng.standard_normal(pts.shape)).astype(np.float32)
        c_inv = np.asarray(fq(jnp.asarray(p), solver="inverse"))
        c_eig = np.asarray(fq(jnp.asarray(p), solver="eigh"))
        # align eigh's arbitrary sign to the inverse solution
        s = np.sign(np.sum(c_inv * c_eig, axis=-1, keepdims=True))
        err = np.linalg.norm(c_inv - s * c_eig, axis=-1)
        assert np.median(err) < 1e-4
        assert np.quantile(err, 0.99) < 5e-3
