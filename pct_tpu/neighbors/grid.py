"""Device-resident uniform grid index for neighbor search.

TPU-native replacement for scipy ``cKDTree`` (ref pointCloudToolbox.py:74).
A k-d tree is pointer-chasing and branchy — hostile to XLA. Instead:
quantize points to grid cells, sort by linearized cell id (one XLA sort),
and answer queries by scanning the 27 (or (2r+1)³) neighboring cells of
the query with `searchsorted` into the sorted id array. Everything is
statically shaped and jit-safe; cell extents may be data-dependent
because linearization uses fixed per-axis multipliers (MAXDIM=1024), so
cell ids never depend on traced dims.

Padding rows (PointCloud.PAD_VALUE) get the sentinel id PAD_ID which
sorts past every valid id, so they never appear as candidates.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

MAXDIM = 1024            # per-axis cells; ids fit int32 (1024^3 = 2^30)
PAD_ID = jnp.int32(1 << 30)
_MULT = (1, MAXDIM, MAXDIM * MAXDIM)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridIndex:
    """Sorted-by-cell point index.

    sorted_points: (N,3) points permuted by cell id
    order:         (N,)  original index of each sorted row
    sorted_ids:    (N,)  linearized cell id per sorted row (PAD_ID for padding)
    origin:        (3,)  grid origin (bbox min minus half cell)
    cell_size:     ()    cell edge length
    dims:          (3,)  int32 number of cells per axis (clipped to MAXDIM)
    num_valid:     ()    int32 valid point count
    """

    sorted_points: jax.Array
    order: jax.Array
    sorted_ids: jax.Array
    origin: jax.Array
    cell_size: jax.Array
    dims: jax.Array
    num_valid: jax.Array


def cell_coords(pts: jax.Array, origin: jax.Array, cell_size: jax.Array,
                dims: jax.Array) -> jax.Array:
    """(..., 3) int32 cell coordinates, clipped into the grid."""
    c = jnp.floor((pts - origin) / cell_size).astype(jnp.int32)
    return jnp.clip(c, 0, dims - 1)


def linearize(coords: jax.Array) -> jax.Array:
    return (coords[..., 0] * _MULT[0]
            + coords[..., 1] * _MULT[1]
            + coords[..., 2] * _MULT[2])


def grid_geometry(lo: jax.Array, hi: jax.Array, cell_size: jax.Array):
    """(origin, dims, clamped cell_size) from a bounding box.

    Shared by the replicated ``build_grid`` and the distributed sort
    (distributed/sort.py) so both quantize points bit-identically."""
    cell_size = jnp.maximum(cell_size, 1e-12)
    origin = lo - 0.5 * cell_size
    dims = jnp.clip(
        jnp.ceil((hi - origin) / cell_size).astype(jnp.int32) + 1, 1, MAXDIM
    )
    return origin, dims, cell_size


def quantize_ids(points: jax.Array, valid: jax.Array, origin: jax.Array,
                 cell_size: jax.Array, dims: jax.Array) -> jax.Array:
    """Linearized cell id per row; PAD_ID where ``valid`` is False."""
    vpts = jnp.where(valid[:, None], points, 0.0)
    ids = linearize(cell_coords(vpts, origin, cell_size, dims))
    return jnp.where(valid, ids, PAD_ID)


@jax.jit
def build_grid(points: jax.Array, num_points: jax.Array,
               cell_size: jax.Array) -> GridIndex:
    """Build the index: quantize -> linearize -> one stable sort.

    The coordinates ride through the sort as extra operands: ONE
    5-operand ``lax.sort`` replaces argsort + two (N,)-row gathers
    (measured 46 -> 30 ms at 1M on v5e — scripts/micro_sort.py; the
    extra sort-pass traffic is cheaper than the random gathers)."""
    n = points.shape[0]
    valid = jnp.arange(n, dtype=jnp.int32) < num_points
    big = jnp.float32(jnp.inf)
    lo = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], points, -big), axis=0)
    origin, dims, cell_size = grid_geometry(lo, hi, cell_size)
    ids = quantize_ids(points, valid, origin, cell_size, dims)
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_ids, order, px, py, pz = jax.lax.sort(
        (ids, iota, points[:, 0], points[:, 1], points[:, 2]),
        num_keys=1, is_stable=True)
    return GridIndex(
        sorted_points=jnp.stack([px, py, pz], axis=-1),
        order=order,
        sorted_ids=sorted_ids,
        origin=origin,
        cell_size=cell_size,
        dims=dims,
        num_valid=num_points,
    )


@partial(jax.jit, static_argnames=("sample",))
def estimate_cell_size(points: jax.Array, num_points: jax.Array, k: int | jax.Array,
                       sample: int = 512) -> jax.Array:
    """Heuristic cell size so the k nearest neighbors of a surface-sampled
    point fall inside a 3×3×3 cell neighborhood. For a 2-manifold with
    mean 1-NN spacing d̄ the kth-neighbor radius is r_k ≈ 1.13·d̄·√k
    (lattice-sampled surfaces trend slightly higher). With rings=1 the
    WORST-CASE guaranteed coverage of the 27-cell window is one cell edge
    (query sitting at a cell corner), so the cell edge must exceed r_k:
    we take 1.35·d̄·√k."""
    from pct_tpu.neighbors.bruteforce import mean_nn_distance

    dbar = mean_nn_distance(points, num_points, sample=sample, chunk=65536)
    return 1.35 * dbar * jnp.sqrt(jnp.float32(k))


def neighbor_cell_ids(qcoords: jax.Array, dims: jax.Array, rings: int) -> jax.Array:
    """(..., (2r+1)³) int32 neighbor-cell ids; out-of-grid cells -> PAD_ID."""
    w = 2 * rings + 1
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-rings, rings + 1)] * 3), indexing="ij"),
        axis=-1,
    ).reshape(w * w * w, 3).astype(jnp.int32)
    nc = qcoords[..., None, :] + offs          # (..., 27, 3)
    ok = jnp.all((nc >= 0) & (nc < dims), axis=-1)
    ids = linearize(jnp.clip(nc, 0, dims - 1))
    return jnp.where(ok, ids, PAD_ID)
