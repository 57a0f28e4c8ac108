"""Exact brute-force kNN on TPU via tiled distance matmuls.

Oracle for the grid kernel (SURVEY.md §7 stage 2) and the fast path for
small clouds: ||q-p||² = ||q||² + ||p||² - 2 q·pᵀ, where the cross term
is an MXU matmul. Replaces the reference's per-point scipy cKDTree query
loop (ref pointCloudToolbox.py:69-85) and the O(N²) PCA neighbor search
(ref pointCloudToolbox.py:914-916).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pct_tpu.core.cloud import PointCloud


def _pairwise_sqdist(q: jax.Array, p: jax.Array) -> jax.Array:
    """(Q,3),(N,3) -> (Q,N) squared distances, cross-term on the MXU."""
    qq = jnp.sum(q * q, axis=1, keepdims=True)
    pp = jnp.sum(p * p, axis=1, keepdims=True).T
    # HIGHEST: on TPU a plain f32 dot runs in bf16 passes — far too coarse
    # for nearest-neighbor discrimination at small separations.
    cross = jnp.dot(q, p.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(qq + pp - 2.0 * cross, 0.0)


@partial(jax.jit, static_argnames=("k", "exclude_self", "tile"))
def knn_bruteforce(
    points: jax.Array,
    num_points: jax.Array,
    k: int,
    queries: jax.Array | None = None,
    query_indices: jax.Array | None = None,
    exclude_self: bool = True,
    tile: int = 2048,
):
    """Exact kNN. Returns (indices (Q,k) int32, dists (Q,k) f32, ascending).

    With ``exclude_self`` the query's own row (``query_indices``, defaults
    to arange when queries is None) is removed — reference semantics of
    "query k+1 and drop self" (ref pointCloudToolbox.py:81-85).
    """
    if queries is None:
        queries = points
        if query_indices is None:
            query_indices = jnp.arange(points.shape[0], dtype=jnp.int32)
    nq = queries.shape[0]
    valid = (jnp.arange(points.shape[0], dtype=jnp.int32) < num_points)

    pad_q = (-nq) % tile
    queries_p = jnp.pad(queries, ((0, pad_q), (0, 0)))
    if exclude_self:
        if query_indices is None:
            raise ValueError("exclude_self requires query_indices")
        qidx_p = jnp.pad(query_indices, (0, pad_q), constant_values=-1)
    else:
        qidx_p = jnp.full((queries_p.shape[0],), -1, dtype=jnp.int32)

    def one_tile(args):
        q, qi = args
        d2 = _pairwise_sqdist(q, points)
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        if exclude_self:
            own = jnp.arange(points.shape[0], dtype=jnp.int32)[None, :] == qi[:, None]
            d2 = jnp.where(own, jnp.inf, d2)
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), jnp.sqrt(jnp.maximum(-neg, 0.0))

    qt = queries_p.reshape(-1, tile, 3)
    it = qidx_p.reshape(-1, tile)
    idx, dist = jax.lax.map(one_tile, (qt, it))
    return idx.reshape(-1, k)[:nq], dist.reshape(-1, k)[:nq]


def knn_cloud(cloud: PointCloud, k: int, tile: int = 2048):
    """All-points self-excluded kNN on a PointCloud (brute force)."""
    return knn_bruteforce(cloud.points, cloud.num_points, k, tile=tile)


def _sampled_nn_fold(points, num_points, sample, chunk):
    """Shared fold: (best (sample,) 1-NN distances, valid_s (sample,))."""
    n = points.shape[0]
    stride = jnp.maximum(num_points // sample, 1)
    sidx = (jnp.arange(sample, dtype=jnp.int32) * stride) % jnp.maximum(num_points, 1)
    s = points[sidx]
    valid_s = jnp.arange(sample) < jnp.minimum(sample, num_points)

    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=2e9)
    base_valid = jnp.arange(n + pad, dtype=jnp.int32) < num_points

    def body(carry, args):
        best = carry
        p, v, gidx = args
        d2 = _pairwise_sqdist(s, p)
        d2 = jnp.where(v[None, :], d2, jnp.inf)
        own = gidx[None, :] == sidx[:, None]
        d2 = jnp.where(own, jnp.inf, d2)
        return jnp.minimum(best, jnp.min(d2, axis=1)), None

    chunks = pts.reshape(-1, chunk, 3)
    vchunks = base_valid.reshape(-1, chunk)
    gi = jnp.arange(n + pad, dtype=jnp.int32).reshape(-1, chunk)
    best, _ = jax.lax.scan(body, jnp.full((sample,), jnp.inf), (chunks, vchunks, gi))
    return jnp.sqrt(best), valid_s


@partial(jax.jit, static_argnames=("sample", "chunk"))
def mean_nn_distance(
    points: jax.Array, num_points: jax.Array, sample: int = 1024, chunk: int = 16384
) -> jax.Array:
    """Mean nearest-neighbor distance over a deterministic sample.

    TPU replacement of ref utils.py:441-470 ``average_distance_using_kd_tree``
    (sample ≤1000 points, scipy KDTree k=2 → mean 1-NN distance); used to
    set grid cell sizes and BPA-style radii. Runs as a running-min fold
    over point chunks so the (sample × N) distance matrix never
    materializes.
    """
    best, valid_s = _sampled_nn_fold(points, num_points, sample, chunk)
    best = jnp.where(valid_s, best, 0.0)
    return jnp.sum(best) / jnp.maximum(jnp.sum(valid_s), 1)


@partial(jax.jit, static_argnames=("sample", "chunk"))
def sampled_nn_distances(
    points: jax.Array, num_points: jax.Array, sample: int = 1024, chunk: int = 16384
) -> jax.Array:
    """(sample,) per-point 1-NN distances over the same deterministic
    stride sample as ``mean_nn_distance``; invalid sample rows carry NaN.

    The DISTRIBUTION (not just the mean) is what spacing-spread-aware
    consumers need: dupin-cyclide-class clouds have ~20× spacing spread,
    and a radii ladder derived from the mean alone leaves the sparse
    side unreconstructed (the reference's 25-rung linspace over
    [0.025·d̄, 5·d̄], utils.py:468, exists for exactly this)."""
    best, valid_s = _sampled_nn_fold(points, num_points, sample, chunk)
    return jnp.where(valid_s, best, jnp.nan)
