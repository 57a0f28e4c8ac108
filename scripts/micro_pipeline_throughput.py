#!/usr/bin/env python
"""Pipelined-throughput probe: back-to-back 1M-cloud dispatches (real TPU).

bench.py's headline is single-cloud LATENCY: dispatch one fused run,
sync, repeat — every iteration pays the host->device dispatch gap over
the tunneled chip. A serving deployment streams clouds: dispatch D runs
back-to-back and sync once; XLA executes them in order while the host
keeps dispatching, so the device never idles between clouds. This
measures per-cloud time at depth D = 1, 2, 4, 8 on the SAME program the
headline uses (warm cache).
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
    from pct_tpu.shapes import generate_shape

    N = 1_000_000
    K = 20
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)
    cell0 = estimate_cell_size(cloud.points, cloud.num_points, K)
    spec, mc = probe_grid_buckets(
        build_grid(cloud.points, cloud.num_points, cell0))

    def run():
        cell = estimate_cell_size(cloud.points, cloud.num_points, K)
        return fused_curvature(cloud.points, cloud.num_points, cell, k=K,
                               max_cells=mc, bucket_spec=spec,
                               method="explicit")

    def sync(x):
        np.asarray(x[0:1])

    r = run()
    sync(r.curv.K)

    for depth in (1, 2, 4, 8):
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run() for _ in range(depth)]
            for o in outs:
                sync(o.curv.K)
            best = min(best, (time.perf_counter() - t0) / depth)
        print(f"depth={depth}: {best:7.4f} s/cloud  "
              f"({N/best/1e6:.2f} M pts/s)", flush=True)


if __name__ == "__main__":
    main()
