"""Implicit-quadric curvature formulas (gradient/Hessian at the origin).

Parity target: ref pointCloudToolbox.py:434-480
``calculate_implicit_quadric_curvatures``. Coefficients
[A..J] for Ax²+By²+Cz²+Dxy+Exz+Fyz+Gx+Hy+Iz+J, evaluated at the origin
(the neighborhood is centered on the query point):

  ∇F = (G, H, I);  Hess = [[2A, D, E], [D, 2B, F], [E, F, 2C]]

Two modes:
- mode="reference": bit-faithful to the reference, including its
  K_g = det(Hess)/|∇F|⁴ — which is NOT the Gaussian curvature of a level
  set (dimensionally wrong; e.g. a unit sphere gives 1/2, not 1) — and
  its unclamped √(H²−K) that yields NaN when the "K" exceeds H²
  (ref :477-478).
- mode="exact" (default): the correct level-set formulas
  K = ∇F·adj(Hess)·∇Fᵀ / |∇F|⁴,
  H = (∇F·Hess·∇Fᵀ − |∇F|² tr Hess) / (2|∇F|³),
  with the explicit-path discriminant clamp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pct_tpu.curvature.explicit import Curvatures


def _grad_hess(coeffs: jax.Array):
    A, B, C, D, E, F = (coeffs[..., 0], coeffs[..., 1], coeffs[..., 2],
                        coeffs[..., 3], coeffs[..., 4], coeffs[..., 5])
    G, H, I = coeffs[..., 6], coeffs[..., 7], coeffs[..., 8]
    g = jnp.stack([G, H, I], axis=-1)
    hess = jnp.stack([
        jnp.stack([2.0 * A, D, E], axis=-1),
        jnp.stack([D, 2.0 * B, F], axis=-1),
        jnp.stack([E, F, 2.0 * C], axis=-1),
    ], axis=-2)
    return g, hess


def _adjugate3(M: jax.Array) -> jax.Array:
    """Adjugate of (...,3,3): adj(M) = det(M)·M⁻¹ without the inverse."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    return jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1),
    ], axis=-2)


def implicit_curvatures(coeffs: jax.Array, mode: str = "exact") -> Curvatures:
    g, hess = _grad_hess(coeffs)
    mag2 = jnp.sum(g * g, axis=-1)
    mag = jnp.sqrt(jnp.maximum(mag2, 1e-30))
    tr = hess[..., 0, 0] + hess[..., 1, 1] + hess[..., 2, 2]
    gHg = jnp.einsum("...i,...ij,...j->...", g, hess, g,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    H_mean = (gHg - mag2 * tr) / (2.0 * mag2 * mag)
    if mode == "reference":
        K = jnp.linalg.det(hess) / jnp.maximum(mag2 * mag2, 1e-30)
        disc = jnp.sqrt(H_mean * H_mean - K)  # unclamped: NaN preserved
    elif mode == "exact":
        gAg = jnp.einsum("...i,...ij,...j->...", g, _adjugate3(hess), g,
                         preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        K = gAg / jnp.maximum(mag2 * mag2, 1e-30)
        disc = jnp.sqrt(jnp.maximum(H_mean * H_mean - K, 0.0))
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return Curvatures(K=K, H=H_mean, k1=H_mean + disc, k2=H_mean - disc,
                      H_sq=H_mean * H_mean)
