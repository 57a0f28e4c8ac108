#!/usr/bin/env python
"""Probe: the moments engine at k=20 on the 1M torus (real TPU).

The list engine's select kernel pays ~12 VPU passes per round x k
rounds over each (C,M) tile; the moments engine pays a fixed ~70
passes (32 threshold-search counts + 35 monomial accumulations)
regardless of k. At k=100 moments wins by construction; this probes
whether it ALSO wins at the k=20 headline shape — and what the
analytic-accuracy trade is (moments carries a 2e-3-class divergence vs
the list chain from RMS preconditioning; at k=100 its K-vs-analytic
was BETTER than the k=20 list path's, so the divergence may be
immaterial here too).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: F401

    from pct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pct_tpu.core import from_numpy
    from pct_tpu.neighbors.cellknn import probe_grid_buckets
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
    from pct_tpu.pipeline.fused import fused_curvature
    from pct_tpu.shapes import analytic_curvatures, generate_shape

    N = 1_000_000
    K = 20
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)
    Ka, _ = analytic_curvatures("torus", pts)
    scale = np.abs(Ka).max()

    cell0 = estimate_cell_size(cloud.points, cloud.num_points, K)
    grid0 = build_grid(cloud.points, cloud.num_points, cell0)

    def sync(x):
        np.asarray(x[0:1])

    def bench(name, run):
        res = run()
        sync(res.curv.K)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = run()
            sync(res.curv.K)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        K_ = np.asarray(res.curv.K)[:N]
        relK = np.abs(K_ - Ka) / scale
        ex = float(np.asarray(res.exact)[:N].mean())
        print(f"{name:14s} {t:7.3f} s  exact={ex:.6f}  "
              f"medK={np.median(relK):.2e}  p99K={np.quantile(relK, 0.99):.2e}"
              f"  nan={float(np.isnan(K_).mean()):.1e}", flush=True)

    # moments route (same tuning as fast_curvature's moments_route)
    spec_m, mc_m, factor = probe_grid_buckets(
        grid0, capacity_cap=max(256, 4 * K), split_to=128)
    print(f"moments buckets: {[(sp.capacity, sp.cand_cap, sp.max_cells) for sp in spec_m]}"
          f" split_factor={factor}", flush=True)

    def run_moments():
        cell = estimate_cell_size(cloud.points, cloud.num_points, K)
        return fused_curvature(cloud.points, cloud.num_points, cell, k=K,
                               max_cells=mc_m, bucket_spec=spec_m,
                               engine="moments", split=(128, factor))

    bench("moments k=20", run_moments)

    # list engine (the production headline) for an apples-to-apples row
    spec_l, mc_l = probe_grid_buckets(grid0)

    def run_list():
        cell = estimate_cell_size(cloud.points, cloud.num_points, K)
        return fused_curvature(cloud.points, cloud.num_points, cell, k=K,
                               max_cells=mc_l, bucket_spec=spec_l,
                               method="explicit")

    bench("list k=20", run_list)


if __name__ == "__main__":
    main()
