"""Closed-form batched symmetric 3×3 eigensolver.

TPU-native replacement for the per-point LAPACK SVD/eigh calls of the
reference (ref pointCloudToolbox.py:280, 925; utils.py:824). A general
eigensolver is iterative and branchy; a symmetric 3×3 has a closed form
(Cardano/trigonometric) that is pure VPU element-wise math, so one
`vmap` handles millions of neighborhoods with no LAPACK round-trip.

Returns eigenvalues ascending + orthonormal eigenvectors in columns,
matching ``numpy.linalg.eigh`` conventions (up to sign).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def eigvalsh3(A: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric (..., 3, 3), ascending."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    safe_p = jnp.maximum(p, _EPS)
    detB = jnp.linalg.det(B)
    r = jnp.clip(detB / (2.0 * safe_p**3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_hi = q + 2.0 * p * jnp.cos(phi)
    lam_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_hi - lam_lo
    return jnp.stack([lam_lo, lam_mid, lam_hi], axis=-1)


def _eigvec_raw(A: jax.Array, lam: jax.Array):
    """Cross-row eigenvector candidate + quality (norm² of the best cross).

    Rows of (A - lam I) span the orthogonal complement of the eigenspace,
    so the largest cross product of two rows is the eigenvector. Quality
    ~0 means lam is (near-)degenerate and the candidate is unreliable.
    """
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None], c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    quality = jnp.maximum(jnp.maximum(n01, n02), n12)
    norm = jnp.sqrt(jnp.maximum(quality, _EPS))[..., None]
    return best / norm, quality


def _any_perp(v: jax.Array) -> jax.Array:
    """A unit vector orthogonal to unit v (axis least aligned with v)."""
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], v.dtype), v.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], v.dtype), v.shape)
    cx, cy = jnp.cross(v, ex), jnp.cross(v, ey)
    nx = jnp.sum(cx * cx, axis=-1, keepdims=True)
    ny = jnp.sum(cy * cy, axis=-1, keepdims=True)
    best = jnp.where(nx >= ny, cx, cy)
    n = jnp.maximum(nx, ny)
    return best / jnp.sqrt(jnp.maximum(n, _EPS))


def _fro_scale(A: jax.Array) -> jax.Array:
    """Frobenius-norm scale for pre-normalization: WITHOUT it, matrices
    with small absolute magnitude (covariances of mm-scale neighborhoods
    are ~1e-5) drop the cross-row quality products below any absolute
    epsilon and every eigenvector silently falls back — the bug class
    that produced ±z 'normals' on sphere equators."""
    s = jnp.sqrt(jnp.sum(A * A, axis=(-2, -1)))
    return jnp.maximum(s, 1e-30)[..., None, None]


def eigh3(A: jax.Array):
    """(w ascending (...,3), V (...,3,3) column eigenvectors).

    Degeneracy-robust: the extreme eigenvalue with the larger spectral
    gap gets the reliable cross-row vector; the other extreme is
    orthogonalized against it (any orthonormal completion is a valid
    eigenbasis when the remaining pair is tied). Fully isotropic input
    returns the canonical basis. Input is Frobenius-normalized so all
    internal thresholds operate at O(1) scale.
    """
    s = _fro_scale(A)
    A = A / s
    w = eigvalsh3(A)
    v_lo_raw, q_lo = _eigvec_raw(A, w[..., 0])
    v_hi_raw, q_hi = _eigvec_raw(A, w[..., 2])
    ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], A.dtype), w.shape)
    lo_better = (q_lo >= q_hi)[..., None]
    # anchor: the better-isolated extreme (canonical z when fully isotropic)
    anchor = jnp.where(lo_better, v_lo_raw, v_hi_raw)
    anchor = jnp.where((jnp.maximum(q_lo, q_hi) > _EPS)[..., None], anchor, ez)
    # other extreme: orthogonalize its raw candidate against the anchor
    other_raw = jnp.where(lo_better, v_hi_raw, v_lo_raw)
    other = other_raw - jnp.sum(other_raw * anchor, axis=-1, keepdims=True) * anchor
    on = jnp.sum(other * other, axis=-1, keepdims=True)
    other = jnp.where(on > 1e-12, other / jnp.sqrt(jnp.maximum(on, _EPS)),
                      _any_perp(anchor))
    v_lo = jnp.where(lo_better, anchor, other)
    v_hi = jnp.where(lo_better, other, anchor)
    v_mid = jnp.cross(v_hi, v_lo)
    V = jnp.stack([v_lo, v_mid, v_hi], axis=-1)
    return w * s[..., 0], V


def smallest_eigvec3(A: jax.Array):
    """(λ_min, unit eigenvector) of symmetric (...,3,3) — the normal path.

    For plane-like neighborhoods (λ0 isolated below λ1≈λ2) the cross-row
    candidate for λ0 is reliable; the fallback only fires on isotropic
    input, where any direction is an eigenvector. Frobenius-normalized
    internally (see _fro_scale).
    """
    s = _fro_scale(A)
    A = A / s
    w = eigvalsh3(A)
    v, q = _eigvec_raw(A, w[..., 0])
    ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], A.dtype), w.shape)
    v = jnp.where((q > _EPS)[..., None], v, ez)
    return w[..., 0] * s[..., 0, 0], v
