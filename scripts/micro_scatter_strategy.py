#!/usr/bin/env python
"""Real-pipeline A/B of the output-move strategy (VERDICT r3 item 2).

Runs the 1M-torus fused pipeline on the TPU with each scatter strategy
and prints wall times:
  - k=100 moments engine: slab | invert | invert_late
    (invert_late = invert the permutation first, epilogue on the ~1.05M
    destination-ordered compact rows instead of the ~1.70M padded flat
    rows — the 62%-padded-row lever from commit d2acf42)
  - k=20 list engine: slab | invert

The strategy is a jit-static (threaded parameter, not a module global),
so each variant compiles and caches separately — no stale-trace hazard.
All data is generated on-device; fences are device-side slices.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def sync(x):
    np.asarray(x[0:1])


def timeit(fn, n=3):
    r = fn()
    sync(r.curv.K)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        sync(r.curv.K)
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def main():
    from pct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pct_tpu.core import from_numpy
    from pct_tpu.neighbors.cellknn import probe_grid_buckets
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
    from pct_tpu.pipeline.fused import fused_curvature
    from pct_tpu.shapes import generate_shape

    N = 1_000_000
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)
    n = int(cloud.num_points)

    # --- k=100 moments ---
    cell100 = estimate_cell_size(cloud.points, cloud.num_points, 100)
    spec100, mc100 = probe_grid_buckets(
        build_grid(cloud.points, cloud.num_points, cell100),
        capacity_cap=400)

    ref_K = None
    for strat in ("slab", "invert", "invert_late"):
        def run(strat=strat):
            cell = estimate_cell_size(cloud.points, cloud.num_points, 100)
            return fused_curvature(cloud.points, cloud.num_points, cell,
                                   k=100, max_cells=mc100,
                                   bucket_spec=spec100, engine="moments",
                                   scatter_strategy=strat)
        t, r = timeit(run)
        K = np.asarray(r.curv.K)[:n]
        ex = float(np.asarray(r.exact)[:n].mean())
        if ref_K is None:
            ref_K = K
            d = 0.0
        else:
            d = float(np.max(np.abs(K - ref_K)))
        print(f"k=100 {strat:12s}: {t*1e3:7.1f} ms  exact={ex:.4f}  "
              f"max|K-slab|={d:.3g}", flush=True)

    # --- k=20 list ---
    cell20 = estimate_cell_size(cloud.points, cloud.num_points, 20)
    spec20, mc20 = probe_grid_buckets(
        build_grid(cloud.points, cloud.num_points, cell20))

    ref_K = None
    for strat in ("slab", "invert"):
        def run(strat=strat):
            cell = estimate_cell_size(cloud.points, cloud.num_points, 20)
            return fused_curvature(cloud.points, cloud.num_points, cell,
                                   k=20, max_cells=mc20, bucket_spec=spec20,
                                   scatter_strategy=strat)
        t, r = timeit(run)
        K = np.asarray(r.curv.K)[:n]
        if ref_K is None:
            ref_K = K
            d = 0.0
        else:
            d = float(np.max(np.abs(K - ref_K)))
        print(f"k=20  {strat:12s}: {t*1e3:7.1f} ms  max|K-slab|={d:.3g}",
              flush=True)


if __name__ == "__main__":
    main()
