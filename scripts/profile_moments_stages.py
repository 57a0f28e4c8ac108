#!/usr/bin/env python
"""Stage-cost breakdown of the k=100 moments pipeline (1M torus, TPU).

Times nested prefixes: prologue (grid+compact+split+bucket args) →
+candidate gather → +moment kernel → +scatter → full (with the
moment→curvature epilogue). Successive deltas ≈ per-stage cost.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def timeit(fn, sync, n=3):
    fn()
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

    from pct_tpu.core import from_numpy
    from pct_tpu.neighbors.cellknn import (
        _tile_candidates, bucketed_tile_args, compact_cells,
        default_select_impl, moments_tile_runner, probe_grid_buckets,
        split_cells)
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
    from pct_tpu.pipeline.fused import (_prime_moment_kernels,
                                        fused_curvature)
    from pct_tpu.shapes import generate_shape

    N = 1_000_000
    K = 100
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)
    p, npts = cloud.points, cloud.num_points
    cell0 = estimate_cell_size(p, npts, K)
    grid0 = build_grid(p, npts, cell0)
    spec, mc, factor = probe_grid_buckets(grid0, capacity_cap=400,
                                          split_to=128)
    print("spec:", [tuple(sp) for sp in spec], "mc:", mc, "factor:", factor)
    from pct_tpu.neighbors.cellknn import _cand_pack

    _prime_moment_kernels(p.dtype, spec, K, pack=_cand_pack(p.shape[0]))
    impl = default_select_impl()

    def prologue(p, npts):
        cell = estimate_cell_size(p, npts, K)
        g = build_grid(p, npts, cell)
        c = compact_cells(g, mc)
        if factor > 1:
            c = split_cells(c, p.shape[0], 128, factor)
        return g, bucketed_tile_args(g, c, spec, 128, impl,
                                     demote_pallas=False)

    @jax.jit
    def s_prologue(p, npts):
        g, buckets = prologue(p, npts)
        acc = jnp.float32(0)
        for sp, tile_args, _ in buckets:
            acc += jnp.sum(tile_args[3]) + jnp.sum(tile_args[4])
        return acc + jnp.sum(g.sorted_points)

    @jax.jit
    def s_gather(p, npts):
        g, buckets = prologue(p, npts)
        acc = jnp.float32(0)
        for sp, tile_args, _ in buckets:
            cell_args = jax.tree_util.tree_map(
                lambda a: a.reshape((-1,) + a.shape[2:]), tile_args)
            cand, ok_cand, cpts, qpts, qrow, ok_q, cover, ro, _ = \
                _tile_candidates(g, cell_args, sp.capacity, sp.cand_cap)
            acc += (jnp.sum(cpts[0]) + jnp.sum(cpts[1]) + jnp.sum(cpts[2])
                    + jnp.sum(qpts) + jnp.sum(cover))
        return acc

    @jax.jit
    def s_kernel(p, npts):
        g, buckets = prologue(p, npts)
        acc = jnp.float32(0)
        for sp, tile_args, impl_b in buckets:
            one = moments_tile_runner(g, K, sp.capacity, sp.cand_cap, impl_b,
                                      None)
            cell_args = jax.tree_util.tree_map(
                lambda a: a.reshape((-1,) + a.shape[2:]), tile_args)
            stats, exact, sigma, qrow, ok_q = one(cell_args)
            acc += jnp.sum(stats) + jnp.sum(sigma)
        return acc

    @jax.jit
    def s_full(p, npts):
        cell = estimate_cell_size(p, npts, K)
        return fused_curvature(p, npts, cell, k=K, max_cells=mc,
                               bucket_spec=spec, engine="moments",
                               split=(128, factor)).curv.K.sum()

    stages = [("prologue", s_prologue), ("gather", s_gather),
              ("moment_kernel", s_kernel), ("full(+epilogue)", s_full)]
    prev = 0.0
    for name, fn in stages:
        out = {}

        def run(fn=fn):
            out["v"] = fn(p, npts)

        def sync():
            np.asarray(out["v"]).reshape(-1)[:1]

        t = timeit(run, sync)
        print(f"{name:18s} cumulative {t*1e3:8.1f} ms   delta "
              f"{(t - prev)*1e3:8.1f} ms", flush=True)
        prev = t


if __name__ == "__main__":
    main()
