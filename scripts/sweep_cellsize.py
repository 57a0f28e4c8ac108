#!/usr/bin/env python
"""Cell-size factor sweep: wall time + exactness vs grid-cell scale.

estimate_cell_size takes cell = 1.35*dbar*sqrt(k) — sized so a POISSON
cloud's r_k fits one cell edge (worst-case 1-ring coverage). On
lattice-ish sampled surfaces (generated shapes, uniform scans) the true
r_k is ~0.56*dbar*sqrt(k), so the window scans ~(1.35/0.56·1.2)² ≈ 4×
more candidates than coverage needs. This sweep scales the cell by f
and measures the bucketed fused pipeline (k=20 select engine, k=100
moments engine) on the 1M torus: wall, exact fraction, bucket shape.

Run on TPU. Each factor re-probes buckets → fresh statics → compiles.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp  # noqa: F401

    from pct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pct_tpu.core import from_numpy
    from pct_tpu.neighbors.cellknn import probe_grid_buckets, split_cells
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
        for f in (1.0, 0.8, 0.7, 0.6, 0.5):
            cell = np.float32(cell0 * f)
            grid = build_grid(p, npts, cell)
            if engine == "moments":
                grid = split_cells(grid, split_to=128)
            try:
                spec, mc = probe_grid_buckets(
                    grid, capacity_cap=max(256, 4 * k))
            except Exception as e:  # noqa: BLE001
                print(f"k={k} f={f}: probe failed: {e}", flush=True)
                continue
            kw = dict(k=k, max_cells=mc, bucket_spec=tuple(spec))
            if engine == "moments":
                kw.update(engine="moments", split=128)

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
            caps = [(sp.capacity, sp.cand_cap) for sp in spec]
            print(f"k={k} f={f}: wall={min(ts)*1e3:.1f} ms exact={ex:.6f} "
                  f"nan={nanf:.2e} buckets={caps}", flush=True)


if __name__ == "__main__":
    main()
