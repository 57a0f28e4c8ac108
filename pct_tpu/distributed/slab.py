"""Slab-resident multi-chip kNN+curvature with ICI halo exchange.

The query-sharded layer (sharding.py) replicates the cloud — right for
≤10⁷ points. This layer is the scale-out design from SURVEY §2: each
chip OWNS a spatial slab of the cloud and only ever holds its slab plus
a halo:

- points are sorted by grid cell id (x fastest) and split into D equal
  contiguous chunks of the sorted order — each chip's chunk is a
  spatially coherent slab;
- neighbor queries near a slab boundary need points from the adjacent
  slabs: each chip sends its first/last ``halo`` sorted rows to its
  mesh neighbors with ``jax.lax.ppermute`` (one ICI hop each way);
- each chip builds a LOCAL grid over [left-halo ++ slab ++ right-halo]
  and runs the FUSED cell-centric kNN + curvature loop
  (neighbors/cellknn.py — the flagship single-chip kernel, not the
  slower query-centric path) over its local cells;
- per-query exactness certification still applies: a kth neighbor that
  could lie beyond the halo shows up as exact=False. ``probe_slab_halo``
  derives the smallest CERTIFIED halo from the sorted cell-id layout
  (the cell-id expression of the kth-distance bound) in one host sync;
  ``slab_curvature_unsorted`` uses it by default, and ``slab_curvature``
  falls back to a max(256, 8k) heuristic when no halo is given (it may
  be traced, where probing is impossible).

Correctness argument: the halo of ``h`` sorted rows on each side covers
every cell whose points can be within the kNN radius of a slab query
because the sorted order is spatially monotone in cell id and the grid
cell size bounds the kNN radius (rings=1 coverage). The certification
makes any violation visible rather than silent.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pct_tpu.curvature.explicit import Curvatures
from pct_tpu.distributed.sharding import POINTS_AXIS, make_mesh  # noqa: F401
from pct_tpu.neighbors.cellknn import (
    _cellwise_setup,
    _scatter_outputs,
    cellwise_tile_runner,
    compact_cells,
    default_max_cells,
    default_select_impl,
)
from pct_tpu.neighbors.grid import build_grid


class SlabResult(NamedTuple):
    curv: Curvatures         # (N,) arrays in SORTED order (slab-concatenated)
    normals: jax.Array
    exact: jax.Array
    kth_dist: jax.Array
    order: jax.Array         # original index per sorted row (for unsorting)


@jax.jit
def _bbox_extents(pts, m):
    """(3,) bbox extents of the first m rows. Module-level jit: the
    in-memory trace cache keys on the function OBJECT, so a per-call
    closure would re-trace (and re-dispatch over the 0.4 s-RTT tunnel)
    on every best_axis_order call."""
    valid = (jnp.arange(pts.shape[0]) < m)[:, None]
    big = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(valid, pts, big), axis=0)
    hi = jnp.max(jnp.where(valid, pts, -big), axis=0)
    return hi - lo


def best_axis_order(points, num_points) -> tuple:
    """Axis permutation putting the largest bbox extent on the SLOWEST
    linearize axis (last). The sorted order is x-fastest/z-slowest, so a
    slab boundary inside a slowest-axis layer forces the halo to cover
    back to the previous layer — thin layers (many cells along the
    slowest axis) minimize that. One tiny host sync (the (3,) extents).
    """
    import numpy as np

    e = np.asarray(_bbox_extents(points, num_points))
    return tuple(int(a) for a in np.argsort(e))  # ascending: largest last


def probe_slab_halo(grid, n_devices: int, min_halo: int = 64,
                    multiple: int = 64) -> int:
    """Certified halo width (sorted rows per side) for ``n_devices`` slabs.

    The per-query certificate in ``slab_curvature`` passes iff the halo
    reaches past every slab query's 3³ cell window in the sorted-id
    order: x_left = ids[b-halo-1] must sit strictly below the slab's
    smallest window id and x_right = ids[b+halo] strictly above the
    largest. A query's window ids span at most ±W around its own cell
    id, W = linearize((1,1,1)) — the cell-id expression of the kNN
    radius bound (the grid guarantees the kth neighbor lies within the
    27-cell stencil, which the single-chip certificate enforces). This
    probe reads the sorted ids once (one host sync, like
    ``probe_grid_buckets``) and returns the smallest halo for which
    EVERY device boundary satisfies both strict inequalities — so
    ``exact`` is 1.0 wherever the single-chip path's would be, not just
    "sound". Raises if a boundary needs a halo ≥ the slab size (too
    many devices for this cloud's occupancy spread).
    """
    import numpy as np

    from pct_tpu.neighbors.grid import _MULT, PAD_ID

    ids = np.asarray(grid.sorted_ids).astype(np.int64)
    n = ids.shape[0]
    d = int(n_devices)
    sl = n // d
    W = _MULT[2] + _MULT[1] + 1   # unclipped 3^3 window id half-span
    pad = int(PAD_ID)
    h = int(min_halo)
    for s in range(1, d):
        b = s * sl
        if ids[b] < pad:
            # left condition for slab s: ids[b-h-1] < min window id
            lo = int(np.searchsorted(ids[:b], ids[b] - W, side="left"))
            h = max(h, b - lo)
        # right condition for slab s-1: x_right above the last VALID
        # query's window (padding rows are not queries)
        j = int(np.searchsorted(ids[:b], pad, side="left")) - 1
        if j >= (s - 1) * sl:
            hi = int(np.searchsorted(ids, ids[j] + W, side="right"))
            h = max(h, hi - b)
    h = ((h + multiple - 1) // multiple) * multiple
    if h >= sl:
        raise ValueError(
            f"certified halo {h} >= slab size {sl}: the cloud's sorted-id "
            f"layout cannot be split into {d} certified slabs — use fewer "
            "devices or the replicated query-sharded layer")
    return h


def slab_curvature(
    mesh: Mesh,
    points: jax.Array,
    num_points: jax.Array,
    cell_size: jax.Array,
    k: int = 20,
    halo: int | None = None,
    capacity: int | None = None,
    cand_cap: int | None = None,
    tile_cells: int = 128,
    method: str = "explicit",
    implicit_mode: str = "exact",
    select_impl: str | None = None,
    distributed_sort: bool = False,
    axis_order: tuple | None = None,
) -> SlabResult:
    """Full slab-resident multi-chip step.

    ``halo``: sorted rows exchanged per side (default 4·k·expected-row
    width ≈ plenty for rings=1 coverage; certified by ``exact``).
    ``axis_order``: static axis permutation applied to the point columns
    before the grid sort (and inverted on the output normals). The sort
    is slowest in the LAST linearize axis, so putting the largest-extent
    axis there makes each slowest-axis layer as thin as possible — the
    certified halo shrinks by ~the aspect ratio on flat-ish clouds
    (kNN/curvature are axis-permutation invariant; only normals need
    unpermuting). ``best_axis_order`` computes it; identity when None.
    ``distributed_sort``: build the global cell-sorted order with the
    sample sort (distributed/sort.py — O(n/d) memory and sort work per
    chip, three ICI collectives) instead of one replicated XLA sort;
    output is bit-identical, and a capacity overflow in the sort
    degrades every point's ``exact`` certificate to False rather than
    returning silently wrong neighborhoods.
    """
    from pct_tpu.pipeline.fused import _curvature_of_neighborhoods

    if select_impl is None:
        select_impl = default_select_impl()
    if capacity is None:
        capacity = ((int(2.5 * k) + 16 + 7) // 8) * 8  # 8-aligned: odd sublane
        # counts compile pathologically slowly in Mosaic (113 s vs 2 s)
    if cand_cap is None:
        cand_cap = 27 * capacity
    if halo is None:
        halo = max(256, 8 * k)
    inv_order = None
    if axis_order is not None and tuple(axis_order) != (0, 1, 2):
        points = points[:, jnp.array(axis_order)]
        inv_order = jnp.argsort(jnp.array(axis_order))
    n = points.shape[0]
    d = len(mesh.devices.ravel())
    assert n % d == 0, "capacity must divide the mesh size"
    assert halo < n // d, "halo must be smaller than the slab size"
    local_n = n // d + 2 * halo
    max_cells = min(((local_n + tile_cells - 1) // tile_cells) * tile_cells,
                    default_max_cells(local_n, k, tile_cells))

    # global cell-sorted order: replicated (one XLA sort — fine while the
    # cloud fits one chip) or the distributed sample sort (O(n/d)/chip)
    sort_ok = None
    if distributed_sort:
        from pct_tpu.distributed.sort import build_grid_distributed

        grid, sort_ok = build_grid_distributed(mesh, points, num_points,
                                               cell_size)
    else:
        grid = build_grid(points, num_points, cell_size)
    sorted_pts = grid.sorted_points
    sorted_ids = grid.sorted_ids

    def local(slab_pts, slab_ids, slab_rows):
        axis = POINTS_AXIS
        # --- halo exchange over ICI ---
        di = jax.lax.axis_index(axis)
        right_edge = slab_pts[-halo:]            # goes to right neighbor
        left_edge = slab_pts[:halo]              # goes to left neighbor
        right_ids = slab_ids[-halo:]
        left_ids = slab_ids[:halo]
        perm_r = [(i, (i + 1) % d) for i in range(d)]
        perm_l = [(i, (i - 1) % d) for i in range(d)]
        from_left = jax.lax.ppermute(right_edge, axis, perm_r)
        from_left_ids = jax.lax.ppermute(right_ids, axis, perm_r)
        from_right = jax.lax.ppermute(left_edge, axis, perm_l)
        from_right_ids = jax.lax.ppermute(left_ids, axis, perm_l)
        # wrap-around halos are geometrically bogus — mask them out by
        # moving them to the pad cell id
        from pct_tpu.neighbors.grid import PAD_ID

        from_left_ids = jnp.where(di == 0, PAD_ID, from_left_ids)
        from_right_ids = jnp.where(di == d - 1, PAD_ID, from_right_ids)

        local_pts = jnp.concatenate([from_left, slab_pts, from_right])
        local_ids = jnp.concatenate([from_left_ids, slab_ids, from_right_ids])
        # local grid: the rows are already cell-sorted EXCEPT the PAD_ID
        # masking above, so re-sort locally (cheap: slab-sized)
        order_l = jnp.argsort(local_ids, stable=True).astype(jnp.int32)
        from pct_tpu.neighbors.grid import GridIndex

        lgrid = GridIndex(
            sorted_points=local_pts[order_l],
            order=jnp.arange(local_ids.shape[0], dtype=jnp.int32)[order_l],
            sorted_ids=local_ids[order_l],
            origin=grid.origin, cell_size=grid.cell_size, dims=grid.dims,
            num_valid=jnp.sum((local_ids != PAD_ID).astype(jnp.int32)),
        )
        # --- fused cell-centric loop over the LOCAL cells (the flagship
        # kernel): every local point (slab + halo) is a query; halo rows'
        # outputs are sliced away below ---
        cells_l = compact_cells(lgrid, max_cells)
        tile_args, _tc, impl = _cellwise_setup(
            lgrid, cells_l, capacity, tile_cells, cand_cap, select_impl,
            pack=1, k=k)  # cellwise_tile_runner fetches unpacked

        def fn(centered, found):
            del found
            return _curvature_of_neighborhoods(centered, method,
                                               implicit_mode)

        one_tile = cellwise_tile_runner(lgrid, k, capacity, cand_cap,
                                        impl, fn)
        out, exact_t, kth_t, qrow_t, ok_q_t = jax.lax.map(one_tile, tile_args)
        (curv_t, normal_t) = out

        # scatter tile outputs to LOCAL-POSITION order (0..local_n) —
        # one row scatter for all outputs (see _scatter_outputs)
        flat = lambda a: a.reshape((-1,) + a.shape[3:])
        qrow_f, ok_f = flat(qrow_t), flat(ok_q_t)
        dest = jnp.where(ok_f, lgrid.order[qrow_f], local_n)
        (curv_l, normal_l), exact_l, kth_l = _scatter_outputs(
            local_n, dest,
            (jax.tree_util.tree_map(flat, curv_t), flat(normal_t)),
            flat(exact_t) & (~cells_l.overflow), flat(kth_t))

        # keep the slab's own rows (drop halo rows)
        sl = lambda a: a[halo:halo + slab_pts.shape[0]]
        curv = Curvatures(*[sl(c) for c in curv_l])
        normal = sl(normal_l)
        exact = sl(exact_l)
        kth = sl(kth_l)

        # --- halo-coverage certificate: the geometric coverage check
        # cannot see points MISSING from the local slab+halo. Each shard
        # learns (one more ppermute) the id of the first row its neighbor
        # did NOT send: every cell id STRICTLY inside (x_left, x_right) is
        # provably complete in the local slab+halo (sorted order), so the
        # query's whole 3³ window id-range must lie strictly inside ---
        from pct_tpu.neighbors.grid import cell_coords, linearize

        slab_n = slab_pts.shape[0]
        # id of our row just before the block we sent right / just after
        # the block we sent left
        own_before_right = slab_ids[slab_n - halo - 1]
        own_after_left = slab_ids[halo]
        x_left = jax.lax.ppermute(own_before_right, axis, perm_r)
        x_right = jax.lax.ppermute(own_after_left, axis, perm_l)
        x_left = jnp.where(di == 0, jnp.int32(-1), x_left)
        x_right = jnp.where(di == d - 1, jnp.int32(2**30 + 2), x_right)
        qc = cell_coords(slab_pts, grid.origin, grid.cell_size, grid.dims)
        win_lo = linearize(jnp.clip(qc - 1, 0, grid.dims - 1))
        win_hi = linearize(jnp.clip(qc + 1, 0, grid.dims - 1))
        exact = exact & (win_lo > x_left) & (win_hi < x_right)
        return curv, normal, exact, kth, slab_rows

    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(POINTS_AXIS, None), P(POINTS_AXIS), P(POINTS_AXIS)),
        out_specs=(Curvatures(*(P(POINTS_AXIS),) * 5), P(POINTS_AXIS, None),
                   P(POINTS_AXIS), P(POINTS_AXIS), P(POINTS_AXIS)),
        check_vma=False,
    )
    curv, normals, exact, kth, rows = shard_fn(sorted_pts, sorted_ids,
                                               grid.order)
    if inv_order is not None:
        normals = normals[:, inv_order]
    if sort_ok is not None:
        exact = exact & sort_ok
    return SlabResult(curv, normals, exact, kth, rows)


def slab_curvature_unsorted(mesh, cloud, k: int = 20, **kw):
    """Convenience: original-order outputs (K, H, normals, exact).

    Eager entry point — when no ``halo`` is passed it picks the
    halo-minimizing axis order and runs ``probe_slab_halo`` on the
    permuted grid, so the certificate is guaranteed to pass wherever
    the single-chip path's would (exact == 1.0 on clean shapes, not
    merely sound)."""
    from pct_tpu.neighbors.grid import estimate_cell_size

    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    if kw.get("halo") is None:
        order = kw.get("axis_order")
        if order is None:
            order = best_axis_order(cloud.points, cloud.num_points)
            kw["axis_order"] = order
        pts_p = cloud.points[:, jnp.array(order)]
        grid = build_grid(pts_p, cloud.num_points, cell)
        kw["halo"] = probe_slab_halo(grid, len(mesh.devices.ravel()))
    res = slab_curvature(mesh, cloud.points, cloud.num_points, cell, k=k, **kw)

    def unsort(a):
        return jnp.zeros_like(a).at[res.order].set(a)

    return (Curvatures(*[unsort(c) for c in res.curv]),
            unsort(res.normals), unsort(res.exact))
