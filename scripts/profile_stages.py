#!/usr/bin/env python
"""Stage-cost breakdown of the fused 1M-point pipeline on the real TPU.

Times nested prefixes of the pipeline (grid build → +compact → +runs
table → +candidate gather+select → full fused chain); successive
differences approximate per-stage cost. Diagnostic tool, not a benchmark.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def timeit(fn, sync, n=3):
    fn()  # compile
    sync()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        sync()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from pct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from functools import partial

    from pct_tpu.core import from_numpy
    from pct_tpu.neighbors.cellknn import (
        _cellwise_setup, _tile_candidates, _tile_select, compact_cells,
        knn_cellwise, probe_grid, default_select_impl)
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
    from pct_tpu.pipeline.fused import fused_curvature
    from pct_tpu.shapes import generate_shape

    N = 1_000_000
    K = 20
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)
    cell0 = estimate_cell_size(cloud.points, cloud.num_points, K)
    grid0 = build_grid(cloud.points, cloud.num_points, cell0)
    _, capacity, mc, cand_cap = probe_grid(grid0)
    print(f"capacity={capacity} max_cells={mc} cand_cap={cand_cap}")

    p, npts = cloud.points, cloud.num_points

    @jax.jit
    def s_cell(p, npts):
        return estimate_cell_size(p, npts, K)

    @jax.jit
    def s_grid(p, npts):
        cell = estimate_cell_size(p, npts, K)
        g = build_grid(p, npts, cell)
        return jnp.sum(g.sorted_points) + jnp.sum(g.sorted_ids)

    @partial(jax.jit, static_argnames=())
    def s_compact(p, npts):
        cell = estimate_cell_size(p, npts, K)
        g = build_grid(p, npts, cell)
        c = compact_cells(g, mc)
        g_s = jnp.sum(g.sorted_points)
        return g_s + jnp.sum(c.start) + jnp.sum(c.count)

    @jax.jit
    def s_runs(p, npts):
        cell = estimate_cell_size(p, npts, K)
        g = build_grid(p, npts, cell)
        c = compact_cells(g, mc)
        tile_args, tc, impl = _cellwise_setup(g, c, capacity, 128, cand_cap,
                                              default_select_impl())
        return (jnp.sum(g.sorted_points) + jnp.sum(c.start)
                + jnp.sum(tile_args[3]) + jnp.sum(tile_args[4]))

    @jax.jit
    def s_knn(p, npts):
        cell = estimate_cell_size(p, npts, K)
        g = build_grid(p, npts, cell)
        c = compact_cells(g, mc)
        r = knn_cellwise(g, c, K, capacity=capacity, cand_cap=cand_cap,
                         original_ids=False, lean=True)
        return jnp.sum(r.indices) + jnp.sum(r.dists) + jnp.sum(r.exact)

    def _tiles(p, npts):
        cell = estimate_cell_size(p, npts, K)
        g = build_grid(p, npts, cell)
        c = compact_cells(g, mc)
        tile_args, tc, impl = _cellwise_setup(g, c, capacity, 128, cand_cap,
                                              default_select_impl())
        return g, tile_args, impl

    @jax.jit
    def s_gather(p, npts):
        # the REAL packed-run candidate fetch (pack=1 like the fused
        # k=20 path), not a synthetic layout
        g, tile_args, impl = _tiles(p, npts)

        def one_tile(args):
            cand, ok_cand, cpts, qpts, qrow, ok_q, cover, ovf, _ = \
                _tile_candidates(g, args, capacity, cand_cap, pack=1)
            return (jnp.sum(cpts[0]) + jnp.sum(cpts[1]) + jnp.sum(cpts[2]),
                    jnp.sum(qpts))

        a, b = jax.lax.map(one_tile, tile_args)
        return jnp.sum(a) + jnp.sum(b)

    @jax.jit
    def s_select_noscatter(p, npts):
        g, tile_args, impl = _tiles(p, npts)

        def one_tile(args):
            pos, dists, found, cand, _, _, qrow, ok_q, exact = _tile_select(
                g, args, K, capacity, cand_cap, impl, pack=1)
            return (jnp.sum(pos), jnp.sum(dists), jnp.sum(exact),
                    jnp.sum(qrow))

        a, b, c2, d = jax.lax.map(one_tile, tile_args)
        return jnp.sum(a) + jnp.sum(b) + jnp.sum(c2) + jnp.sum(d)

    # bucketed statics: what the bench's flagship path actually runs
    from pct_tpu.neighbors.cellknn import probe_grid_buckets
    spec_b, mc_b = probe_grid_buckets(grid0)

    @jax.jit
    def s_full(p, npts):
        cell = estimate_cell_size(p, npts, K)
        return fused_curvature(p, npts, cell, k=K, max_cells=mc_b,
                               bucket_spec=tuple(spec_b)).curv.K.sum()

    stages = [("cell_size", s_cell), ("grid(sort)", s_grid),
              ("compact", s_compact), ("runs(searchsorted)", s_runs),
              ("gather_only", s_gather),
              ("gather+select", s_select_noscatter),
              ("knn(lean)", s_knn), ("fused_full", s_full)]
    prev = 0.0
    for name, fn in stages:
        out = {}

        def run(fn=fn):
            out["v"] = fn(p, npts)

        def sync():
            np.asarray(out["v"]).reshape(-1)[:1]
            np.asarray(jnp.zeros(()) + 0.0)

        t = timeit(run, sync)
        print(f"{name:22s} cumulative {t*1e3:8.1f} ms   delta "
              f"{(t - prev)*1e3:8.1f} ms")
        prev = t


if __name__ == "__main__":
    main()
