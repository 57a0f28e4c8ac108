"""Neighbor-count convergence study — vectorized ladder instead of
per-point binary search.

Reference behavior (ref pointCloudToolbox.py:732-800
``explicit_quadratic_neighbor_study``): sample ≤500 random points and,
per point, binary-search k ∈ [3, 99] for the smallest neighborhood where
|K(k+1) − K(k)| < tol, each probe re-querying the kd-tree and refitting;
returns int(mean(converged_k)) + 1. The sister implicit study
(ref :827-881) is dead code (NameErrors) and is deliberately not
reproduced.

TPU redesign (SURVEY §7 stage 5): query max_k neighbors ONCE for the
sample batch, then evaluate the curvature at every ladder rung k =
kmin..kmax simultaneously — each rung is just the same gathered
neighborhoods with a shorter mask — and take the smallest converged k
per sample. One fused pass, no re-queries, no host loop. Note the
divergence (documented): bisection can stop at a locally-converged k
that is not the smallest; the ladder returns the true smallest, which is
the intended semantics of the study.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pct_tpu.core.cloud import PointCloud
from pct_tpu.curvature.explicit import explicit_curvatures
from pct_tpu.fit.frames import tangent_frames
from pct_tpu.fit.quadratic import fit_quadratic
from pct_tpu.neighbors.knn import knn_cloud_grid


@partial(jax.jit, static_argnames=("kmin", "kmax"))
def _ladder_converged_k(points, sample_idx, nbr_idx, kmin: int, kmax: int,
                        tol: float, scale_sq=1.0, tol_rel: float = 0.0):
    """nbr_idx: (S, kmax+1) neighbor indices (ascending by distance).

    Returns (converged_k (S,) int32, converged mask (S,) bool): smallest
    k in [kmin, kmax] with |K(k+1) - K(k)|·scale² < tol. ``scale_sq``
    normalizes K to a unit-scale cloud (K has units 1/length²): the
    reference's absolute tol=1e-7 presumes unit-scale shapes and never
    converges on e.g. the 0.1-scale bunny (K ~ 10²-10⁵), aborting every
    scan — the scale factor reproduces reference behavior exactly on
    unit shapes and gives scale-invariant behavior elsewhere
    (documented divergence).
    """
    q = points[sample_idx]
    nbrs = points[nbr_idx] - q[:, None, :]          # (S, kmax+1, 3)
    kmax_p1 = nbr_idx.shape[1]
    ks = jnp.arange(kmin, kmax_p1 + 1, dtype=jnp.int32)   # rungs kmin..kmax+1

    def curv_at_k(k):
        m = jnp.arange(kmax_p1, dtype=jnp.int32)[None, :] < k
        rotated, _, _ = tangent_frames(nbrs, jnp.broadcast_to(m, nbrs.shape[:2]))
        coeffs = fit_quadratic(rotated, jnp.broadcast_to(m, nbrs.shape[:2]))
        return explicit_curvatures(coeffs).K          # (S,)

    K_ladder = jax.lax.map(curv_at_k, ks) * scale_sq  # (R, S) unit-scale
    diff = jnp.abs(K_ladder[1:] - K_ladder[:-1])      # rung k vs k+1
    # absolute criterion (reference) plus an optional RELATIVE term for
    # real scans, whose K is large and noisy at any absolute tolerance
    conv = diff < tol + tol_rel * jnp.abs(K_ladder[:-1])   # (R-1, S)
    first = jnp.argmax(conv, axis=0)                  # first True, else 0
    any_conv = jnp.any(conv, axis=0)
    return (kmin + first).astype(jnp.int32), any_conv


def explicit_quadratic_neighbor_study(
    cloud: PointCloud,
    tol: float = 1e-7,
    sample_size: int = 500,
    kmin: int = 3,
    kmax: int = 99,
    seed: int = 0,
    tol_rel: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Returns (recommended_k scalar int32, per-sample converged k).

    recommended_k = int(mean(converged samples)) + 1
    (ref pointCloudToolbox.py:797-800). One jit call end-to-end —
    staged eagerly, the grid build + sampling cost ~20 tunnel
    round-trips (~10 s of a 14.6 s bunny study, measured).
    """
    sample_size = min(sample_size, cloud.capacity)
    return _study_jit(cloud.points, cloud.num_points, sample_size=sample_size,
                      kmin=kmin, kmax=kmax, seed=seed, tol=float(tol),
                      tol_rel=float(tol_rel))


@partial(jax.jit, static_argnames=("sample_size", "kmin", "kmax", "seed",
                                   "tol", "tol_rel"))
def _study_jit(points, num_points, sample_size: int, kmin: int, kmax: int,
               seed: int, tol: float, tol_rel: float):
    key = jax.random.PRNGKey(seed)
    n = num_points
    # uniform sample of valid points (ref :751-754 random.sample)
    sample_idx = (jax.random.uniform(key, (sample_size,))
                  * n.astype(jnp.float32)).astype(jnp.int32)
    sample_idx = jnp.clip(sample_idx, 0, jnp.maximum(n - 1, 0))

    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
    from pct_tpu.neighbors.knn import knn_grid

    cell = estimate_cell_size(points, num_points, kmax + 1)
    grid = build_grid(points, num_points, cell)
    res = knn_grid(grid, points[sample_idx], kmax + 1,
                   query_indices=sample_idx,
                   capacity=int(2.5 * kmax) + 16, tile=min(512, sample_size))
    # characteristic scale (max distance from centroid over valid points,
    # ref utils.py:767-775) — normalizes the convergence tolerance
    valid = jnp.arange(points.shape[0]) < n
    vm = valid[:, None].astype(jnp.float32)
    centroid = jnp.sum(points * vm, axis=0) / jnp.maximum(
        jnp.sum(vm), 1.0)
    d2 = jnp.sum((points - centroid) ** 2, axis=-1)
    scale_sq = jnp.maximum(jnp.max(jnp.where(valid, d2, 0.0)), 1e-20)
    conv_k, conv_mask = _ladder_converged_k(
        points, sample_idx, res.indices, kmin, kmax, tol,
        scale_sq=scale_sq, tol_rel=tol_rel,
    )
    # reference parity (ref :790-791 ``if best is None: best = upper``):
    # samples that never converge contribute the UPPER bound, pushing
    # the mean HIGH — noisy/perturbed clouds then proceed at large k
    # instead of aborting with a bogus tiny converged_k
    conv_k_full = jnp.where(conv_mask, conv_k, kmax)
    mean_k = jnp.mean(conv_k_full.astype(jnp.float32))
    return mean_k.astype(jnp.int32) + 1, jnp.where(conv_mask, conv_k, -1)
