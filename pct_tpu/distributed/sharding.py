"""Multi-chip spatial sharding of the FUSED curvature pipeline.

The reference is strictly single-process (SURVEY.md §2 "Parallelism"),
so this layer is a design obligation, not a port: points are the only
scaling axis, and after neighbor search every stage is pointwise. The
decomposition:

- the cloud (N,3) is replicated — 1M points ≈ 12 MB, far below HBM;
  the *work* is what gets sharded;
- the grid index is built once (replicated compute: one sort);
- the unit of sharded work is a TILE OF OCCUPIED CELLS from the
  cell-centric kNN (neighbors/cellknn.py) — the flagship fused kernel,
  NOT the slower query-centric path. Cells are spatially contiguous in
  the compacted table, so each chip owns coherent slabs of cells and
  its candidate gathers stay local to its slab of the sorted array
  (which XLA keeps replicated: gathers are pure reads, no traffic);
- per-tile compute is the exact same ``cellwise_tile_runner`` body the
  single-chip ``fused_curvature`` runs, so a D-chip run and a 1-chip
  run produce BIT-IDENTICAL curvatures — the partition only changes
  which chip executes which tile (test_distributed.py asserts 1.0
  agreement);
- global statistics (NaN census, mean |K|/|H|) reduce with `psum`
  over the mesh axis — ICI collectives, the NCCL-equivalent.

For clouds too large to replicate (≫10⁸ points) see distributed/slab.py:
true slab residency + `ppermute` halo exchange; the replicated form is
the right trade below that scale and is what the benchmark configs
(≤1M points) need.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pct_tpu.curvature.explicit import Curvatures
from pct_tpu.neighbors.cellknn import (
    bucketed_tile_args,
    _cellwise_setup,
    _scatter_outputs,
    cellwise_tile_runner,
    compact_cells,
    default_max_cells,
    default_select_impl,
    moments_tile_runner,
)
from pct_tpu.neighbors.grid import PAD_ID, build_grid

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
    exact: jax.Array          # (N,) certified-exact kNN coverage per point
    kth_dist: jax.Array       # (N,) distance to the kth neighbor
    stats: ShardedStats


def sharded_curvature(
    mesh: Mesh,
    points: jax.Array,
    num_points: jax.Array,
    cell_size: jax.Array,
    k: int = 20,
    capacity: int | None = None,
    max_cells: int | None = None,
    cand_cap: int | None = None,
    tile_cells: int = 128,
    method: str = "explicit",
    implicit_mode: str = "exact",
    select_impl: str | None = None,
    bucket_spec: tuple | None = None,
    engine: str = "list",
    split: tuple | None = None,
) -> ShardedResult:
    """Full multi-chip curvature step (jit this, or call inside jit).

    Runs the fused cell-centric pipeline (grid kNN select + frames +
    quadratic fit + curvature evaluated INSIDE the cell loop) with the
    tile axis sharded over ``mesh``. Statics default to the same
    heuristics as ``pipeline.fused.fused_curvature``; pass probe-tuned
    values — or a ``bucket_spec`` from ``probe_grid_buckets`` for the
    occupancy-bucketed flagship layout — for zero-waste padding.
    ``exact`` reports the per-point coverage certificate so callers can
    audit (and repair) coverage — there is no silent approximation on
    the multichip path.

    ``engine``/``split`` mirror ``fused_curvature``: ``engine="moments"``
    runs the large-k moment-accumulation path (ops/pallas_moments.py,
    explicit method only) — each chip reduces its cells to moment stats
    and runs the moment→curvature epilogue on its OWN flat rows
    (pre-scatter, like the single-chip post_fn), so the epilogue is
    embarrassingly sharded too; ``split=(cap, factor)`` virtual-splits
    oversized cells (neighbors.cellknn.split_cells) so no bucket
    capacity exceeds ``cap``.
    """
    from pct_tpu.pipeline.fused import _curvature_of_neighborhoods

    if engine == "moments" and method != "explicit":
        raise ValueError("engine='moments' supports method='explicit' only")
    if select_impl is None:
        select_impl = default_select_impl()
    if capacity is None:
        capacity = ((int(2.5 * k) + 16 + 7) // 8) * 8  # 8-aligned: odd sublane
        # counts compile pathologically slowly in Mosaic (113 s vs 2 s)
    n = points.shape[0]
    d = len(mesh.devices.ravel())
    if max_cells is None:
        max_cells = default_max_cells(n, k, tile_cells)
    grid = build_grid(points, num_points, cell_size)
    cells = compact_cells(grid, max_cells)
    if split is not None and split[1] > 1:
        from pct_tpu.neighbors.cellknn import split_cells

        cells = split_cells(cells, n, split[0], split[1])

    def _pad_tiles(tile_args):
        # pad the tile axis to a multiple of the mesh size with PAD
        # tiles (empty cells: count 0 -> ok_q False everywhere ->
        # dropped at the final scatter); real tiles compute exactly what
        # the 1-chip fused path computes.
        nt = tile_args[0].shape[0]
        pad = (-nt) % d
        if pad:
            fills = (PAD_ID, n, 0, 0, 0, False)
            tile_args = tuple(
                jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                        constant_values=f)
                for a, f in zip(tile_args, fills))
        return tile_args

    moments = engine == "moments"
    runner = moments_tile_runner if moments else cellwise_tile_runner
    # cellwise runner: unpacked fetch (packed relayout loses on that
    # path); moments runner: auto pack, like the single-chip dispatch
    pack = None if moments else 1

    # normalize both layouts to a list of (capacity, cand_cap, impl, args)
    if bucket_spec is not None:
        buckets = [
            (sp.capacity, sp.cand_cap, impl_b, args)
            for sp, args, impl_b in bucketed_tile_args(
                grid, cells, bucket_spec, tile_cells, select_impl,
                pad_tiles_to=d, demote_pallas=not moments, pack=pack, k=k)
        ]
    else:
        if cand_cap is None:
            cand_cap = 27 * capacity
        tile_args, tile_cells, select_impl = _cellwise_setup(
            grid, cells, capacity, tile_cells, cand_cap, select_impl,
            demote_pallas=not moments, pack=pack, k=k)
        buckets = [(capacity, cand_cap, select_impl, _pad_tiles(tile_args))]

    def fn(centered, found):
        del found  # parity: the reference uses all k slots unconditionally
        return _curvature_of_neighborhoods(centered, method, implicit_mode)

    grid_specs = jax.tree.map(lambda _: P(), grid)
    statics = [(cap_b, rc_b, impl_b) for cap_b, rc_b, impl_b, _ in buckets]
    all_args = tuple(args for _, _, _, args in buckets)

    def local(grid_rep, all_args_l):
        outs, exacts, kths, qrows, okqs = [], [], [], [], []
        for (cap_b, rc_b, impl_b), args in zip(statics, all_args_l):
            one_tile = runner(grid_rep, k, cap_b, rc_b, impl_b, fn)
            if moments and impl_b == "pallas":
                # ONE pallas call over this chip's cells of the bucket
                # (the kernel grid axis IS the cell axis; pallas inside
                # lax.map at 1M scale never finishes XLA compilation —
                # same layout as apply_cellwise_bucketed)
                cell_args = jax.tree_util.tree_map(
                    lambda a: a.reshape((-1,) + a.shape[2:]), args)
                out, exact, kth, qrow, ok_q = one_tile(cell_args)
                flat = lambda a: a.reshape((-1,) + a.shape[2:])
            else:
                out, exact, kth, qrow, ok_q = jax.lax.map(one_tile, args)
                flat = lambda a: a.reshape((-1,) + a.shape[3:])
            # flatten each bucket to rows (bucket capacities differ)
            outs.append(jax.tree_util.tree_map(flat, out))
            exacts.append(flat(exact))
            kths.append(flat(kth))
            qrows.append(flat(qrow))
            okqs.append(flat(ok_q))
        out = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *outs)
        exact = jnp.concatenate(exacts)
        kth = jnp.concatenate(kths)
        qrow = jnp.concatenate(qrows)
        ok_q = jnp.concatenate(okqs)
        if moments:
            # moment->curvature epilogue on this chip's OWN flat rows
            # (row-for-row, so it commutes with the final scatter): the
            # epilogue is embarrassingly sharded, and the global scatter
            # moves ~11 output columns instead of the 48-lane stats slab
            from pct_tpu.fit.moments import curvature_from_moments_chunked

            stats48 = out
            curv, normal = curvature_from_moments_chunked(
                stats48[..., :35], stats48[..., 38], stats48[..., 39:42],
                stats48[..., 42:45])
            out = (curv, normal)
        (curv, _normal) = out
        # global reductions over the mesh axis (ICI psum); NaN-tolerant
        # like the reference's census (a handful of degenerate fits must
        # not poison the global statistics)
        finite = ok_q & jnp.isfinite(curv.K) & jnp.isfinite(curv.H)
        cnt = jnp.maximum(
            jax.lax.psum(jnp.sum(finite.astype(jnp.float32)), POINTS_AXIS),
            1.0)
        m_absK = jax.lax.psum(
            jnp.sum(jnp.where(finite, jnp.abs(curv.K), 0.0)), POINTS_AXIS
        ) / cnt
        m_absH = jax.lax.psum(
            jnp.sum(jnp.where(finite, jnp.abs(curv.H), 0.0)), POINTS_AXIS
        ) / cnt
        vcnt = jnp.maximum(
            jax.lax.psum(jnp.sum(ok_q.astype(jnp.float32)), POINTS_AXIS), 1.0)
        nan_frac = jax.lax.psum(
            jnp.sum(jnp.where(ok_q & (~jnp.isfinite(curv.K)), 1.0, 0.0)),
            POINTS_AXIS) / vcnt
        stats = ShardedStats(m_absK, m_absH, nan_frac)
        return out, exact, kth, qrow, ok_q, stats

    tile_spec = jax.tree.map(lambda _: P(POINTS_AXIS), all_args)
    row_spec = P(POINTS_AXIS)
    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(grid_specs, tile_spec),
        out_specs=(
            (Curvatures(*(row_spec,) * 5), row_spec),
            row_spec, row_spec, row_spec, row_spec,
            ShardedStats(P(), P(), P()),
        ),
        check_vma=False,
    )
    (curv, normals), exact, kth, qrow, ok_q, stats = shard_fn(grid, all_args)

    # final scatter to the caller's original point order (replicated
    # compute, ONE row scatter for all outputs) — identical to
    # apply_cellwise's epilogue
    dest = jnp.where(ok_q, grid.order[qrow], n)
    (curv_n, normals_n), exact_n, kth_n = _scatter_outputs(
        n, dest, (curv, normals), exact & (~cells.overflow), kth)
    return ShardedResult(curv=curv_n, normals=normals_n, exact=exact_n,
                         kth_dist=kth_n, stats=stats)
