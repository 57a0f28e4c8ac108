"""Multi-chip spatial sharding of the curvature pipeline.

The reference is strictly single-process (SURVEY.md §2 "Parallelism"),
so this layer is a design obligation, not a port: points are the only
scaling axis, and after neighbor search every stage is pointwise. The
decomposition:

- the cloud (N,3) is replicated — 1M points ≈ 12 MB, far below HBM;
  the *work* (queries) is what gets sharded;
- the grid index is built once (replicated compute: one sort);
- queries are sharded along the grid-sorted order, so each chip owns a
  SPATIALLY CONTIGUOUS slab of cells — gathers stay chip-local and
  cache-coherent, which is the slab-sharding of SURVEY §2 without
  needing a halo exchange (the replicated cloud *is* the halo);
- global statistics (NaN census, curvature sums for energies) reduce
  with `psum` over the mesh axis — ICI collectives, the NCCL-equivalent.

For clouds too large to replicate (≫10⁸ points) the design extends to
true slab residency + `ppermute` halo cell exchange; the query-sharded
form is the right trade below that scale and is what the benchmark
configs (≤1M points) need.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pct_tpu.curvature.explicit import Curvatures
from pct_tpu.neighbors.grid import build_grid
from pct_tpu.neighbors.knn import knn_grid
from pct_tpu.pipeline.fused import _curvature_of_neighborhoods

POINTS_AXIS = "points"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (POINTS_AXIS,))


class ShardedStats(NamedTuple):
    mean_abs_K: jax.Array     # global psum-reduced mean |K|
    mean_abs_H: jax.Array
    nan_fraction: jax.Array   # global NaN census (ref utils.py:524-533)


class ShardedResult(NamedTuple):
    curv: Curvatures          # per-point, original order, replicated layout
    normals: jax.Array
    stats: ShardedStats


def sharded_curvature(
    mesh: Mesh,
    points: jax.Array,
    num_points: jax.Array,
    cell_size: jax.Array,
    k: int = 20,
    capacity: int | None = None,
    rings: int = 1,
    knn_tile: int = 512,
    method: str = "explicit",
) -> ShardedResult:
    """Full multi-chip curvature step (jit this, or call inside jit).

    Capacity of ``points`` must be divisible by the mesh size (the
    PointCloud padding policy guarantees multiples of 1024).
    """
    if capacity is None:
        capacity = int(2.5 * k) + 16
    grid = build_grid(points, num_points, cell_size)
    grid_specs = jax.tree.map(lambda _: P(), grid)

    def local_shard(pts_rep, grid_rep, q_shard, qidx_shard):
        res = knn_grid(grid_rep, q_shard, k, query_indices=qidx_shard,
                       capacity=capacity, rings=rings, tile=knn_tile,
                       exclude_self=True)
        centered = pts_rep[res.indices] - q_shard[:, None, :]
        curv, normal = _curvature_of_neighborhoods(centered, method, "exact")
        # global reductions over the mesh axis (ICI psum); NaN-tolerant like
        # the reference's census (a handful of degenerate fits must not
        # poison the global statistics)
        valid = qidx_shard < num_points
        finite = valid & jnp.isfinite(curv.K) & jnp.isfinite(curv.H)
        cnt = jnp.maximum(
            jax.lax.psum(jnp.sum(finite.astype(jnp.float32)), POINTS_AXIS),
            1.0)
        m_absK = jax.lax.psum(
            jnp.sum(jnp.where(finite, jnp.abs(curv.K), 0.0)), POINTS_AXIS) / cnt
        m_absH = jax.lax.psum(
            jnp.sum(jnp.where(finite, jnp.abs(curv.H), 0.0)), POINTS_AXIS) / cnt
        vcnt = jnp.maximum(
            jax.lax.psum(jnp.sum(valid.astype(jnp.float32)), POINTS_AXIS), 1.0)
        nan_frac = jax.lax.psum(
            jnp.sum(jnp.where(valid & (~jnp.isfinite(curv.K)), 1.0, 0.0)),
            POINTS_AXIS) / vcnt
        stats = ShardedStats(m_absK, m_absH, nan_frac)
        return curv, normal, stats

    shard_fn = jax.shard_map(
        local_shard,
        mesh=mesh,
        in_specs=(P(), grid_specs, P(POINTS_AXIS, None), P(POINTS_AXIS)),
        out_specs=(
            Curvatures(*(P(POINTS_AXIS),) * 5),
            P(POINTS_AXIS, None),
            ShardedStats(P(), P(), P()),
        ),
        check_vma=False,
    )
    curv_sorted, normals_sorted, stats = shard_fn(
        points, grid, grid.sorted_points, grid.order)

    def unsort(a):
        return jnp.zeros_like(a).at[grid.order].set(a)

    return ShardedResult(
        curv=Curvatures(*[unsort(c) for c in curv_sorted]),
        normals=unsort(normals_sorted),
        stats=stats,
    )
