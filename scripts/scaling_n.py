#!/usr/bin/env python
"""Single-chip throughput scaling in N for the flagship fused pipeline.

The reference's sweep envelope stops at 1M points
(/root/reference/main_shape_validation.py:61: N in {200k..1M}); this
extends it to 4M on one v5e chip to show the cell-loop design's
throughput holds as the cloud outgrows the sweep (static per-tile
working set; totals scale linearly). Emits one CSV row per N:
    n,seconds,points_per_sec,exact_fraction,nan_fraction
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    from pct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pct_tpu.core import from_numpy
    from pct_tpu.neighbors.cellknn import probe_grid_buckets
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
    from pct_tpu.pipeline.fused import fused_curvature
    from pct_tpu.shapes import generate_shape

    K = 20
    print("n,seconds,points_per_sec,exact_fraction,nan_fraction", flush=True)
    for n in (200_000, 500_000, 1_000_000, 2_000_000, 4_000_000):
        pts, _ = generate_shape("torus", n, radius=1.0)
        cloud = from_numpy(pts, pad_multiple=1 << 16)
        cell0 = estimate_cell_size(cloud.points, cloud.num_points, K)
        spec, mc = probe_grid_buckets(
            build_grid(cloud.points, cloud.num_points, cell0))

        def run():
            cell = estimate_cell_size(cloud.points, cloud.num_points, K)
            return fused_curvature(cloud.points, cloud.num_points, cell,
                                   k=K, max_cells=mc, bucket_spec=spec)

        res = run()
        np.asarray(res.curv.K[0:1])  # compile + fence
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = run()
            np.asarray(res.curv.K[0:1])
            times.append(time.perf_counter() - t0)
        t = min(times)
        Kv = np.asarray(res.curv.K)[:n]
        exact = float(np.asarray(res.exact)[:n].mean())
        print(f"{n},{t:.4f},{n / t:.1f},{exact:.6f},"
              f"{float(np.isnan(Kv).mean()):.6f}", flush=True)


if __name__ == "__main__":
    main()
