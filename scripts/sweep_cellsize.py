#!/usr/bin/env python
"""Cell-size factor sweep: wall time + exactness vs grid-cell scale.

estimate_cell_size takes cell = 1.35*dbar*sqrt(k) — sized so a POISSON
cloud's r_k fits one cell edge (worst-case 1-ring coverage). On
lattice-ish sampled surfaces (generated shapes, uniform scans) the true
r_k is ~0.56*dbar*sqrt(k), so the 27-cell window scans ~(1.35/0.56)^2
≈ 4x more candidates than coverage needs in-plane. This sweep scales
the cell by f and measures the bucketed fused pipeline (k=20 select
engine, k=100 moments engine — the two bench paths, probed exactly as
bench.py probes them) on the 1M torus: wall, exact fraction, NaN
fraction, bucket shapes.

Run on TPU. Each factor re-probes buckets -> fresh statics -> compiles;
budget ~an hour cold.

MEASURED (1M torus, v5e, 2026-08-20, /tmp/sweep_cellsize_r3.log) — the
lever is a DEAD END under the exact=1.0 certificate:
  k=20  f=1.0: 421 ms exact=1.000 | f=0.85: 477 ms exact=1.000 |
        f=0.7: 612 ms exact=0.727 | f=0.6: 852 ms 0.400 | f=0.5: 1026 ms 0.057
  k=100 f=1.0: 420 ms exact=1.000 | f=0.85: 327 ms exact=0.975 |
        f=0.7: 332 ms exact=0.665
Shrinking the cell below the Poisson-safe edge moves the true k-th
neighbor outside the 27-cell stencil for a growing fraction of queries
(exact<1), and at k=20 it's not even faster: more cells -> more runs ->
more per-cell fixed cost dominates the smaller candidate rows. The
0.56*dbar*sqrt(k) in-plane estimate ignores that coverage needs the
WORST query's r_k inside one edge, not the mean. A 22% k=100 win at
f=0.85 is available only by giving up 2.5% exactness — rejected.
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
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)
    p, npts = cloud.points, cloud.num_points
    n = int(npts)

    for k, engine in ((20, "select"), (100, "moments")):
        cell0 = float(np.asarray(estimate_cell_size(p, npts, k)))
        for f in (1.0, 0.85, 0.7, 0.6, 0.5):
            cell = np.float32(cell0 * f)
            grid = build_grid(p, npts, cell)
            try:
                if engine == "moments":
                    spec, mc, factor = probe_grid_buckets(
                        grid, capacity_cap=400, split_to=128)
                    kw = dict(k=k, max_cells=mc, bucket_spec=tuple(spec),
                              engine="moments", split=(128, factor))
                else:
                    spec, mc = probe_grid_buckets(grid)
                    kw = dict(k=k, max_cells=mc, bucket_spec=tuple(spec),
                              method="explicit")
            except Exception as e:  # noqa: BLE001
                print(f"k={k} f={f}: probe failed: {e}", flush=True)
                continue

            def run():
                return fused_curvature(p, npts, cell, **kw)

            r = run()
            ex = float(np.asarray(r.exact)[:n].mean())
            nanf = float(np.isnan(np.asarray(r.curv.K)[:n]).mean())
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = run()
                np.asarray(r.curv.K[:1])
                ts.append(time.perf_counter() - t0)
            caps = [(sp.capacity, sp.cand_cap, sp.max_cells) for sp in spec]
            print(f"k={k} f={f}: wall={min(ts)*1e3:.1f} ms exact={ex:.6f} "
                  f"nan={nanf:.2e} buckets={caps}", flush=True)


if __name__ == "__main__":
    main()
