"""Isolate which stage of the 1M k=100 moments pipeline compiles slowly.

Stage A: one bucket's lax.map(one_tile) alone (kernel in map, no
         scatter, no curvature chain)
Stage B: all 3 buckets + flatten/concat + scatter epilogue
Stage C: full fused_curvature(engine="moments")

Run on the real TPU with a CLEAN compile queue; never kill mid-compile
(orphaned server compiles wedge the queue for everyone).
"""

import time

import numpy as np

from pct_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pct_tpu.core import from_numpy  # noqa: E402
from pct_tpu.neighbors.cellknn import (  # noqa: E402
    bucketed_tile_args,
    compact_cells,
    moments_tile_runner,
    probe_grid_buckets,
)
from pct_tpu.neighbors.grid import build_grid, estimate_cell_size  # noqa: E402
from pct_tpu.shapes import generate_shape  # noqa: E402


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def main():
    N = 1_000_000
    k = 100
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)
    t0 = time.perf_counter()
    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    spec, mc = probe_grid_buckets(grid, capacity_cap=max(256, 4 * k))
    cells = compact_cells(grid, mc)
    buckets = bucketed_tile_args(grid, cells, spec, 128, "pallas",
                                 demote_pallas=False)
    print("probe+args:", round(time.perf_counter() - t0, 1), "s; spec:",
          [(sp.capacity, sp.cand_cap, sp.max_cells) for sp, _, _ in buckets],
          flush=True)

    # --- stage A: single-bucket map ---
    sp0, args0, impl0 = buckets[0]

    @jax.jit
    def stage_a(grid, args):
        one_tile = moments_tile_runner(grid, k, sp0.capacity, sp0.cand_cap,
                                       impl0)
        return jax.lax.map(one_tile, args)

    t0 = time.perf_counter()
    out = stage_a(grid, args0)
    sync(out)
    print("stage A (bucket-0 map) compile+run:",
          round(time.perf_counter() - t0, 1), "s", flush=True)
    t0 = time.perf_counter()
    sync(stage_a(grid, args0))
    print("stage A steady:", round(time.perf_counter() - t0, 2), "s",
          flush=True)

    # --- stage B: all buckets + scatter ---
    n = grid.sorted_points.shape[0]

    @jax.jit
    def stage_b(grid, all_args):
        outs, dests = [], []
        for (sp, _, impl), args in zip(buckets, all_args):
            one_tile = moments_tile_runner(grid, k, sp.capacity, sp.cand_cap,
                                           impl)
            stats, exact, kth, qrow, ok_q = jax.lax.map(one_tile, args)
            flat = lambda a: a.reshape((-1,) + a.shape[3:])
            outs.append(flat(stats))
            dests.append(jnp.where(flat(ok_q), grid.order[flat(qrow)], n))
        stats = jnp.concatenate(outs)
        dest = jnp.concatenate(dests)
        return jnp.zeros((n, stats.shape[-1]), jnp.float32).at[dest].set(
            stats, mode="drop")

    all_args = tuple(a for _, a, _ in buckets)
    t0 = time.perf_counter()
    sb = stage_b(grid, all_args)
    sync(sb)
    print("stage B (all buckets + scatter) compile+run:",
          round(time.perf_counter() - t0, 1), "s", flush=True)
    t0 = time.perf_counter()
    sync(stage_b(grid, all_args))
    print("stage B steady:", round(time.perf_counter() - t0, 2), "s",
          flush=True)

    # --- stage C: full path ---
    from pct_tpu.pipeline.fused import fused_curvature

    t0 = time.perf_counter()
    res = fused_curvature(cloud.points, cloud.num_points, cell, k=k,
                          max_cells=mc, bucket_spec=spec, engine="moments")
    sync(res.curv.K)
    print("stage C (full fused) compile+run:",
          round(time.perf_counter() - t0, 1), "s", flush=True)
    t0 = time.perf_counter()
    res = fused_curvature(cloud.points, cloud.num_points, cell, k=k,
                          max_cells=mc, bucket_spec=spec, engine="moments")
    sync(res.curv.K)
    print("stage C steady:", round(time.perf_counter() - t0, 2), "s;",
          "exact:", float(np.asarray(res.exact)[:N].mean()), flush=True)


if __name__ == "__main__":
    main()
