"""PCA-based curvature proxies.

Two reference behaviors, both reduced to one batched covariance eigensolve:

1. ``pca_principal_curvatures`` — parity with
   ``principal_curvatures_via_principal_component_analysis``
   (ref pointCloudToolbox.py:901-945): per point, covariance of the
   k-neighborhood, top-2 eigenvalues reported as "principal curvatures",
   top-2 eigenvectors as directions, K = λ1·λ2, H = (λ1+λ2)/2. The
   reference finds neighbors by a brute-force O(N²) python loop; here any
   NeighborResult works (grid or brute force).

2. ``surface_variation`` — parity with ref utils.py:778-829
   ``estimate_curvature``: surface variation λ0/(λ0+λ1+λ2) with λ0 the
   smallest eigenvalue (the only vectorized routine in the reference; its
   einsum+eigh structure is the template this whole framework batches).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pct_tpu.fit.eigh3 import eigh3, eigvalsh3
from pct_tpu.fit.frames import neighborhood_covariance


class PCACurvatures(NamedTuple):
    k1: jax.Array          # largest covariance eigenvalue   (ref λ1)
    k2: jax.Array          # second covariance eigenvalue    (ref λ2)
    K: jax.Array           # λ1·λ2   (ref :938)
    H: jax.Array           # (λ1+λ2)/2  (ref :939)
    dir1: jax.Array        # (..., 3) eigenvector of λ1
    dir2: jax.Array        # (..., 3) eigenvector of λ2


def _gather_centered(points: jax.Array, indices: jax.Array,
                     center_on_query: bool = True) -> jax.Array:
    """(N,3), (Q,k) -> (Q,k,3) neighborhoods centered on the query point."""
    nbrs = points[indices]
    if center_on_query:
        q = points[: indices.shape[0]] if indices.shape[0] <= points.shape[0] \
            else points
        nbrs = nbrs - q[:, None, :]
    return nbrs


def pca_principal_curvatures(points: jax.Array, indices: jax.Array,
                             mask: jax.Array | None = None) -> PCACurvatures:
    """points (N,3), neighbor indices (N,k) -> PCA curvature proxies.

    The reference includes the query point's own covariance contribution
    implicitly by centering on the neighborhood mean (np.cov); neighbor
    gathers here exclude self (reference drops self from kNN), matching
    ref :916 semantics (neighbors only).
    """
    nbrs = points[indices]                    # (N, k, 3)
    cov = neighborhood_covariance(nbrs, mask)
    w, V = eigh3(cov)                         # ascending
    lam1, lam2 = w[..., 2], w[..., 1]
    return PCACurvatures(
        k1=lam1, k2=lam2, K=lam1 * lam2, H=0.5 * (lam1 + lam2),
        dir1=V[..., :, 2], dir2=V[..., :, 1],
    )


def surface_variation(points: jax.Array, indices: jax.Array,
                      mask: jax.Array | None = None) -> jax.Array:
    """λ0/(λ0+λ1+λ2) per point (ref utils.py:826-827)."""
    nbrs = points[indices]
    cov = neighborhood_covariance(nbrs, mask)
    w = eigvalsh3(cov)
    total = jnp.sum(w, axis=-1)
    return w[..., 0] / jnp.maximum(total, 1e-30)
