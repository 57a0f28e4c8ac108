#!/usr/bin/env python
"""Sweep the candidate-gather pack factor on the packed paths (real TPU).

The k=20 fused path pins pack=1 (measured loss — see
neighbors.cellknn._cand_pack); the library-kNN rows path and the k=100
moments engine take the default. This sweep times both at pack in
{8, 16, 32} by patching ``_cand_pack``: the gather row count falls
``pack``x while M inflates only by ~9*(pack - run_cap % pack) slack, so
larger packs keep winning until the per-axis unpack relayout (cost ~
constant in pack) stops being amortized.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: F401
    import jax.numpy as jnp  # noqa: F401

    from pct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pct_tpu.core import from_numpy
    from pct_tpu.neighbors import cellknn
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
    from pct_tpu.pipeline.fused import fused_curvature
    from pct_tpu.shapes import generate_shape

    N = 1_000_000
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)

    def sync(x):
        np.asarray(x[0:1])

    def timeit(fn, reps=3):
        out = fn()
        sync(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    K = 20
    cell = estimate_cell_size(cloud.points, cloud.num_points, K)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    spec, mc = cellknn.probe_grid_buckets(grid)

    base_pack = cellknn._cand_pack

    for pack in (8, 16, 32):
        cellknn._cand_pack = lambda n, _p=pack: _p if n % _p == 0 else 1

        # library kNN full ids+dists (bucketed rows path) — same call
        # bench.py's bench_library_knn makes
        def run_lib():
            g = build_grid(cloud.points, cloud.num_points, cell)
            cells = cellknn.compact_cells(g, mc)
            return cellknn.knn_cellwise_bucketed(g, cells, K, spec,
                                                 lean=False)

        t_lib = timeit(lambda: run_lib().dists[:, 0])
        print(f"pack={pack:3d} library_knn_full: {t_lib*1e3:8.1f} ms",
              flush=True)

    # k=100 moments engine — same call bench.py's bench_k100 makes
    cell100 = estimate_cell_size(cloud.points, cloud.num_points, 100)
    spec100, mc100 = cellknn.probe_grid_buckets(
        build_grid(cloud.points, cloud.num_points, cell100),
        capacity_cap=400)
    for pack in (8, 16, 32):
        cellknn._cand_pack = lambda n, _p=pack: _p if n % _p == 0 else 1

        def run_k100():
            cell = estimate_cell_size(cloud.points, cloud.num_points, 100)
            return fused_curvature(cloud.points, cloud.num_points, cell,
                                   k=100, max_cells=mc100,
                                   bucket_spec=spec100, engine="moments")

        t_m = timeit(lambda: run_k100().curv.K)
        print(f"pack={pack:3d} k100_moments:     {t_m*1e3:8.1f} ms",
              flush=True)

    cellknn._cand_pack = base_pack


if __name__ == "__main__":
    main()
