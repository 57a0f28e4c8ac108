"""Single-jit fused pipeline: grid build → kNN → frames → fit → curvature.

`curvature_pipeline` composes separately-jitted stages, which costs one
host↔device round-trip per stage (expensive over a TPU tunnel) and
blocks XLA from scheduling across stages. This module traces the WHOLE
chain — including the grid sort — as one XLA program: zero host syncs,
everything resident in HBM.

Perf-critical layout choice: the kNN kernel emits SORTED-space neighbor
ids and the curvature stage gathers from ``grid.sorted_points`` — the
original-id translation (an 84M-element gather at 1M×k=20) never
happens. Only the final (N,)-sized outputs are scattered back to the
caller's point order.

This is the north-star benchmark path (BASELINE.json: 1M-point kNN +
quadric-fit curvature < 1 s on one chip).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pct_tpu.curvature.explicit import Curvatures, explicit_curvatures
from pct_tpu.curvature.implicit import implicit_curvatures
from pct_tpu.fit.frames import tangent_frames
from pct_tpu.fit.quadratic import fit_quadratic
from pct_tpu.fit.quadric import fit_quadric
from pct_tpu.neighbors.cellknn import compact_cells, default_max_cells, knn_cellwise
from pct_tpu.neighbors.grid import build_grid


class FusedResult(NamedTuple):
    curv: Curvatures          # per-point K/H/k1/k2/H², caller's point order
    normals: jax.Array        # (N, 3) sign-fixed normals
    exact: jax.Array          # (N,) certified-exact kNN per point
    kth_dist: jax.Array       # (N,) distance to the kth neighbor


def _curvature_of_neighborhoods(points, queries, idx, method, implicit_mode):
    nbrs = points[idx] - queries[:, None, :]
    if method == "explicit":
        rotated, _, normal = tangent_frames(nbrs)
        coeffs = fit_quadratic(rotated)
        return explicit_curvatures(coeffs), normal
    elif method == "implicit":
        _, _, normal = tangent_frames(nbrs)
        coeffs = fit_quadric(nbrs)
        return implicit_curvatures(coeffs, mode=implicit_mode), normal
    raise ValueError(f"unknown method {method!r}")


@partial(jax.jit, static_argnames=("k", "capacity", "max_cells", "tile_cells",
                                   "run_cap", "curv_tile", "method",
                                   "implicit_mode"))
def fused_curvature(
    points: jax.Array,
    num_points: jax.Array,
    cell_size: jax.Array,
    k: int = 20,
    capacity: int | None = None,
    max_cells: int | None = None,
    tile_cells: int = 128,
    run_cap: int | None = None,
    curv_tile: int = 16384,
    method: str = "explicit",
    implicit_mode: str = "exact",
) -> FusedResult:
    """One XLA program: everything from raw padded points to curvatures.

    Static capacities (``capacity``, ``max_cells``, ``run_cap``) default
    to conservative heuristics; pass the values from
    ``neighbors.cellknn.probe_grid`` for a tuned zero-waste layout. No
    exactness repair pass inside (that needs a host decision) — the
    ``exact`` output lets the caller audit coverage.
    """
    if capacity is None:
        capacity = int(2.5 * k) + 16
    n = points.shape[0]
    if max_cells is None:
        max_cells = default_max_cells(n, k, tile_cells)
    grid = build_grid(points, num_points, cell_size)
    cells = compact_cells(grid, max_cells)
    res = knn_cellwise(grid, cells, k, capacity=capacity,
                       tile_cells=tile_cells, run_cap=run_cap,
                       original_ids=False, lean=True)

    # fused curvature over sorted queries, tiled for bounded working sets
    pad = (-n) % curv_tile
    q_p = jnp.pad(grid.sorted_points, ((0, pad), (0, 0)))
    i_p = jnp.pad(res.indices, ((0, pad), (0, 0)))

    def one_tile(args):
        q, idx = args
        return _curvature_of_neighborhoods(grid.sorted_points, q, idx,
                                           method, implicit_mode)

    curv, normals = jax.lax.map(
        one_tile, (q_p.reshape(-1, curv_tile, 3),
                   i_p.reshape(-1, curv_tile, k))
    )
    unpad = lambda a: a.reshape((-1,) + a.shape[2:])[:n]
    curv = Curvatures(*[unpad(c) for c in curv])
    normals = unpad(normals)

    # scatter the (N,)-sized outputs back to the caller's point order
    def unsort(a):
        return jnp.zeros_like(a).at[grid.order].set(a)

    return FusedResult(
        curv=Curvatures(*[unsort(c) for c in curv]),
        normals=unsort(normals),
        exact=unsort(res.exact),
        kth_dist=unsort(res.dists[:, 0]),   # lean mode: (n, 1) kth distance
    )
