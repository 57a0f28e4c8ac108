"""Single-jit fused pipeline: grid build → kNN → frames → fit → curvature.

`curvature_pipeline` composes separately-jitted stages, which costs one
host↔device round-trip per stage (expensive over a TPU tunnel) and
blocks XLA from scheduling across stages. This module traces the WHOLE
chain — including the grid sort — as one XLA program: zero host syncs,
everything resident in HBM.

Perf-critical layout choice: curvature is evaluated INSIDE the cell
loop (`neighbors.cellknn.apply_cellwise`) on neighborhoods gathered
tile-locally from the candidate set already in flight. Three large
memory passes of the two-stage design never happen: the (N,k) neighbor
index scatter, the (N·k,3) neighborhood re-gather from HBM, and the
final sorted→original unsort of every output — only the (N,)-sized
curvature/normal outputs are scattered, directly to the caller's point
order.

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
from pct_tpu.neighbors.cellknn import (
    apply_cellwise,
    apply_cellwise_bucketed,
    compact_cells,
    default_max_cells,
)
from pct_tpu.neighbors.grid import build_grid


class FusedResult(NamedTuple):
    curv: Curvatures          # per-point K/H/k1/k2/H², caller's point order
    normals: jax.Array        # (N, 3) sign-fixed normals
    exact: jax.Array          # (N,) certified-exact kNN per point
    kth_dist: jax.Array       # (N,) distance to the kth neighbor


def _curvature_of_neighborhoods(centered, method, implicit_mode):
    """(..., k, 3) query-centered neighborhoods -> (Curvatures, normals).

    Same chain as the reference per-point loop (ref pointCloudToolbox.py
    :635-647): frames → fit → curvature formulas, batched over all
    leading axes.
    """
    if method == "explicit":
        rotated, _, normal = tangent_frames(centered)
        coeffs = fit_quadratic(rotated)
        return explicit_curvatures(coeffs), normal
    elif method == "implicit":
        _, _, normal = tangent_frames(centered)
        coeffs = fit_quadric(centered)
        return implicit_curvatures(coeffs, mode=implicit_mode), normal
    raise ValueError(f"unknown method {method!r}")


@partial(jax.jit, static_argnames=("k", "capacity", "max_cells", "tile_cells",
                                   "cand_cap", "method", "implicit_mode",
                                   "bucket_spec", "engine", "split",
                                   "scatter_strategy"))
def _fused_curvature_jit(
    points: jax.Array,
    num_points: jax.Array,
    cell_size: jax.Array,
    k: int = 20,
    capacity: int | None = None,
    max_cells: int | None = None,
    tile_cells: int = 128,
    cand_cap: int | None = None,
    method: str = "explicit",
    implicit_mode: str = "exact",
    bucket_spec: tuple | None = None,
    engine: str = "list",
    split: tuple | None = None,
    scatter_strategy: str = "invert",
) -> FusedResult:
    """One XLA program: everything from raw padded points to curvatures.

    Static capacities (``capacity``, ``max_cells``, ``cand_cap``) default
    to conservative heuristics; pass the values from
    ``neighbors.cellknn.probe_grid`` for a tuned zero-waste layout, or a
    ``bucket_spec`` from ``probe_grid_buckets`` (tuple of BucketSpec) to
    run the cell loop occupancy-bucketed — padding waste then tracks each
    cell's actual size (capacity/cand_cap are ignored in that case). No
    exactness repair pass inside (that needs a host decision) — the
    ``exact`` output lets the caller audit coverage.

    ``engine``: "list" materializes the (C,k,3) winner neighborhoods via
    the top-k select kernel (fastest at k ≲ 64); "moments" accumulates
    35 monomial sums per query instead (ops/pallas_moments.py) — O(32·M)
    count passes instead of O(k·M) argmin rounds, the large-k path
    (explicit method only; k-th distance ties get fractional weights,
    see fit/moments.py). On real TPUs pass a ``bucket_spec`` with the
    moments engine (``fast_curvature`` does): the conservative
    single-bucket statics at k≈100 (capacity≈272, M≈7k) drive Mosaic's
    kernel compile to ~10 minutes, while probe-tuned buckets
    (capacity ≤ 128, M ≤ 3k) compile in seconds.
    """
    if engine == "moments" and method != "explicit":
        raise ValueError("engine='moments' supports method='explicit' only")
    if capacity is None:
        capacity = ((int(2.5 * k) + 16 + 7) // 8) * 8  # 8-aligned: odd sublane
        # counts compile pathologically slowly in Mosaic (113 s vs 2 s)
    n = points.shape[0]
    if max_cells is None:
        max_cells = default_max_cells(n, k, tile_cells)
    grid = build_grid(points, num_points, cell_size)
    cells = compact_cells(grid, max_cells)
    if split is not None and split[1] > 1:
        # virtual-split big cells so no bucket capacity exceeds split[0]
        # (Mosaic compile blowup guard — see neighbors.cellknn.split_cells;
        # bucket_spec must come from probe_grid_buckets(split_to=split[0]))
        from pct_tpu.neighbors.cellknn import split_cells

        cells = split_cells(cells, n, split[0], split[1])

    def fn(centered, found):
        del found  # parity: the reference uses all k slots unconditionally
        curv, normal = _curvature_of_neighborhoods(
            centered, method, implicit_mode)
        return curv, normal

    runner = None
    post_fn = None
    if engine == "moments":
        from pct_tpu.fit.moments import curvature_from_moments_chunked
        from pct_tpu.neighbors.cellknn import moments_tile_runner

        runner = moments_tile_runner

        def post_fn(stats):
            # ONE moment->curvature pass over the flat TILE-ORDER stats,
            # BEFORE the row scatter (the epilogue is row-for-row, so it
            # commutes with the permutation): the packed scatter then
            # moves ~11 output columns instead of the 50-column stats —
            # measured ~250 ms of the 1M k=100 wall was that wide
            # scatter. Traced ONCE here (the symbolic rotation is ~5k
            # HLO ops; instantiating it inside every per-bucket lax.map
            # body made the 1M XLA compile pathological) and chunked
            # over rows: the contraction rotation's (·,3,3,3,3)
            # intermediates tile to (4,128) on TPU — unchunked, M4
            # alone is 19.3 GB at 1M (round-2 OOM).
            curv, normals = curvature_from_moments_chunked(
                stats[..., :35], stats[..., 38], stats[..., 39:42],
                stats[..., 42:45])
            return {"curv": curv, "normals": normals}

    if bucket_spec is not None:
        out, exact, kth = apply_cellwise_bucketed(
            grid, cells, k, fn, bucket_spec, tile_cells=tile_cells,
            dest_order="original", runner=runner, post_fn=post_fn,
            scatter_strategy=scatter_strategy)
    else:
        out, exact, kth = apply_cellwise(
            grid, cells, k, fn, capacity=capacity, tile_cells=tile_cells,
            cand_cap=cand_cap, dest_order="original", runner=runner,
            post_fn=post_fn, scatter_strategy=scatter_strategy)
    if engine == "moments":
        curv, normals = out["curv"], out["normals"]
    else:
        curv, normals = out
    return FusedResult(curv=curv, normals=normals, exact=exact,
                       kth_dist=kth)


_MOMENT_PRIMED: set = set()


def _prime_moment_kernels(dtype, spec, k: int, pack: int = 1):
    """Pre-compile each bucket's moment kernel standalone at its exact
    in-program shapes (zeros inputs, seconds each). Empirically the same
    kernels compiled INSIDE the 1M whole-program XLA compile never
    finish (>50 min, reproduced 4x), while a program whose kernels were
    already compiled in-process finishes in ~30 s — the Mosaic compile
    inside XLA's custom-call lowering appears to bypass its own cache
    only when cold. Called automatically by ``fused_curvature`` for the
    moments engine (memoized per (dtype, spec, k)); no-op on CPU, where
    the XLA fallback path runs instead."""
    import jax

    if jax.default_backend() == "cpu":
        return
    key = (jnp.dtype(dtype).name, tuple(spec), int(k), int(pack))
    if key in _MOMENT_PRIMED:
        return
    from pct_tpu.neighbors.cellknn import _cand_m
    from pct_tpu.ops.pallas_moments import knn_moments

    for sp in spec:
        t_cells = sp.max_cells
        m = _cand_m(sp.cand_cap, pack)
        z3 = jnp.zeros((t_cells, sp.capacity, 3), dtype)
        c3 = jnp.zeros((t_cells, m, 3), dtype)
        icand = jnp.full((t_cells, m), -2, jnp.int32)
        irow = jnp.full((t_cells, sp.capacity), -1, jnp.int32)
        ival = jnp.zeros((t_cells, m), jnp.int32)
        knn_moments(z3, c3, icand, irow, ival, k).block_until_ready()
    _MOMENT_PRIMED.add(key)


def fused_curvature(
    points: jax.Array,
    num_points: jax.Array,
    cell_size: jax.Array,
    k: int = 20,
    capacity: int | None = None,
    max_cells: int | None = None,
    tile_cells: int = 128,
    cand_cap: int | None = None,
    method: str = "explicit",
    implicit_mode: str = "exact",
    bucket_spec: tuple | None = None,
    engine: str = "list",
    split: tuple | None = None,
    scatter_strategy: str = "invert",
) -> FusedResult:
    """Public entry for the single-jit fused pipeline.

    Thin dispatch over the jitted implementation: for the moments
    engine on real TPUs it first pre-compiles each bucket's Pallas
    moment kernel standalone (memoized — see ``_prime_moment_kernels``;
    a cold Mosaic compile inside the 1M whole-program XLA compile never
    finishes), so calling ``fused_curvature(engine="moments")``
    directly is always safe. See ``_fused_curvature_jit`` for the
    argument contract.
    """
    if engine == "moments" and bucket_spec is not None:
        from pct_tpu.neighbors.cellknn import _cand_pack

        _prime_moment_kernels(points.dtype, bucket_spec, k,
                              pack=_cand_pack(points.shape[0]))
    return _fused_curvature_jit(
        points, num_points, cell_size, k=k, capacity=capacity,
        max_cells=max_cells, tile_cells=tile_cells, cand_cap=cand_cap,
        method=method, implicit_mode=implicit_mode,
        bucket_spec=bucket_spec, engine=engine, split=split,
        scatter_strategy=scatter_strategy)


def fast_curvature(cloud, k: int = 20, method: str = "explicit",
                   implicit_mode: str = "exact",
                   coarse_spec: bool = False) -> FusedResult:
    """Probe-tuned fused curvature on a PointCloud: the fastest path.

    Convenience wrapper over ``fused_curvature``: estimates the grid
    cell size, runs the host-side occupancy-bucket probe
    (``probe_grid_buckets`` — one compaction + one sync, amortized by
    the compilation cache across clouds of a family), and executes the
    single-jit bucketed pipeline. Use ``curvature_pipeline`` instead
    when you also need neighbor indices/distances or fit coefficients.

    Large neighborhoods (k ≳ 64): the top-k select kernel's O(k·M)
    rounds (and its VMEM working set) stop paying — such clouds route
    through the MOMENT engine (ops/pallas_moments.py: O(32·M) count
    passes + 35 monomial sums per query, curvature rebuilt from the
    moments), which runs the 1M-point k=100 class in seconds where the
    list-based cell loop was minutes. Implicit-method requests at large
    k fall back to the query-centric staged path (no moment form).
    """
    from pct_tpu.neighbors.cellknn import probe_grid_buckets
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size

    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    grid = build_grid(cloud.points, cloud.num_points, cell)

    def moments_route():
        # capacity cap scales with k: at k=100 the auto cell size packs
        # ~2k points/cell in dense regions; a too-low cap leaves
        # overfull-cell rows uncovered (exact=False, zero outputs).
        # split_to=128: sparse clouds (bunny) otherwise produce a single
        # capacity-272 bucket whose Mosaic compile never finishes —
        # virtual-split keeps every bucket in the seconds-class C <= 128
        spec, mc, factor = probe_grid_buckets(
            grid, capacity_cap=max(256, 4 * k), split_to=128)
        return fused_curvature(cloud.points, cloud.num_points, cell, k=k,
                               max_cells=mc, bucket_spec=spec,
                               method=method, engine="moments",
                               split=(128, factor))

    if method == "explicit" and k >= 64:
        # large k: the select kernel's O(k·M) unrolled rounds stop
        # paying (runtime AND compile time) — always take the moments
        # engine, not just when the select working set overflows
        return moments_route()
    # coarse_spec: single coarsely-rounded bucket whose statics collide
    # across clouds of a family — compiled-program REUSE instead of a
    # per-cloud ~50 s re-tune compile. Right for once-per-mesh vertex
    # fits (mesh_pipeline); the tight DP spec stays the default for the
    # headline paths.
    spec, mc = probe_grid_buckets(grid, capacity_cap=max(256, 4 * k),
                                  coarse=coarse_spec)
    # select path runs unpacked (cellwise_tile_runner pins pack=1).
    # pallas_select_ok models the FULL kernel working set (2 live
    # (block,C,M) copies + (block,C,k) outputs — the terms the old
    # capacity*cand_cap*12 formula missed, which admitted the round-4
    # scoped-VMEM OOM class) and rejects the Mosaic compile-hazard
    # class (k >= 32 with k*M ~ 200k: 34-min compiles).
    from pct_tpu.neighbors.cellknn import pallas_select_ok

    select_ok = all(pallas_select_ok(sp.capacity, sp.cand_cap, k)
                    for sp in spec)
    if not select_ok:
        if method != "explicit":
            from pct_tpu.neighbors.knn import knn_cloud_grid
            from pct_tpu.pipeline.curvature_pipeline import (
                pointwise_curvature,
            )

            res, _ = knn_cloud_grid(cloud, k)
            curv, normals, _ = pointwise_curvature(
                cloud.points, res.indices, method=method,
                implicit_mode=implicit_mode)
            return FusedResult(curv=curv, normals=normals, exact=res.exact,
                               kth_dist=res.dists[:, -1])
        return moments_route()
    return fused_curvature(cloud.points, cloud.num_points, cell, k=k,
                           max_cells=mc, bucket_spec=spec, method=method,
                           implicit_mode=implicit_mode)
