"""Independent float64 numpy implementation of the reference algorithm
chain (SURVEY.md §3.4), used as a test oracle.

This is a clean-room re-derivation from the documented math (covariance
-> smallest singular direction -> sign fix vs farthest-nearest neighbor
vector -> Rodrigues to +z -> quadratic lstsq -> Monge formulas), not a
copy of the reference source.
"""

from __future__ import annotations

import numpy as np


def plane_and_rotate(centered: np.ndarray):
    cov = np.cov(centered.T)
    _, _, Vt = np.linalg.svd(cov)
    n = Vt[-1]
    ref_vec = centered[-1] - centered[0]
    if np.dot(n, ref_vec) < 0:
        n = -n
    z = np.array([0.0, 0.0, 1.0])
    v = np.cross(n, z)
    s = np.linalg.norm(v)
    c = float(n @ z)
    if s < 1e-8:
        R = np.eye(3)
    else:
        K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        R = np.eye(3) + K + K @ K * ((1 - c) / s**2)
    return centered @ R.T, R, n


def quadratic_fit(rotated: np.ndarray) -> np.ndarray:
    a, b, z = rotated[:, 0], rotated[:, 1], rotated[:, 2]
    X = np.stack([a * a, b * b, a * b, a, b, np.ones_like(a)], axis=1)
    coef, *_ = np.linalg.lstsq(X, z, rcond=None)
    return coef


def monge_curvatures(coef: np.ndarray):
    A, B, C, D, E, _ = coef
    Fx, Fy, Fxx, Fyy, Fxy = D, E, 2 * A, 2 * B, C
    w = 1 + Fx**2 + Fy**2
    K = (Fxx * Fyy - Fxy**2) / w**2
    H = ((1 + Fx**2) * Fyy - 2 * Fx * Fy * Fxy + (1 + Fy**2) * Fxx) / (2 * w**1.5)
    return K, H


def reference_explicit_chain(points: np.ndarray, indices: np.ndarray):
    """Per-point K, H, normal via the reference algorithm in float64."""
    n = indices.shape[0]
    K = np.zeros(n)
    H = np.zeros(n)
    normals = np.zeros((n, 3))
    pts = points.astype(np.float64)
    for i in range(n):
        centered = pts[indices[i]] - pts[i]
        rotated, _, nrm = plane_and_rotate(centered)
        coef = quadratic_fit(rotated)
        K[i], H[i] = monge_curvatures(coef)
        normals[i] = nrm
    return K, H, normals
