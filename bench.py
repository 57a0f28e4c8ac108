#!/usr/bin/env python
"""North-star benchmark: kNN + quadric-fit curvature on a 1M-point torus,
one TPU chip (BASELINE.json).

Prints the HEADLINE JSON line as soon as it is measured (so a failure in
any secondary metric can never zero out the round's perf record — the
round-2 lesson), then re-prints the line enriched with the secondary
metrics at the end. Every secondary metric is individually guarded: a
failure degrades to an ``<name>_error`` field. The driver takes the last
parseable JSON line.

  {"metric": ..., "value": pts/s/chip, "unit": "points/s", "vs_baseline": x}

vs_baseline is against the reference's measured curvature-core throughput
of ~6.3k points/s/core (BASELINE.md: 13.6 s kNN + 40.0 s fits + 3.1 s
formulas for 339,735 points on the author's laptop).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pct_tpu.core import from_numpy
    from pct_tpu.neighbors.cellknn import probe_grid_buckets
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
    from pct_tpu.pipeline.fused import fused_curvature
    from pct_tpu.shapes import analytic_curvatures, generate_shape

    N = 1_000_000
    K_NEIGHBORS = 20
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)

    # one-time occupancy-bucket probe (static-shape tuning; reused across
    # runs of the same cloud family)
    cell0 = estimate_cell_size(cloud.points, cloud.num_points, K_NEIGHBORS)
    spec, mc = probe_grid_buckets(
        build_grid(cloud.points, cloud.num_points, cell0))

    def run():
        cell = estimate_cell_size(cloud.points, cloud.num_points, K_NEIGHBORS)
        return fused_curvature(cloud.points, cloud.num_points, cell,
                               k=K_NEIGHBORS, max_cells=mc,
                               bucket_spec=spec, method="explicit")

    def sync(x):
        # np.asarray round-trip: block_until_ready is not a reliable fence
        # on the tunneled axon platform
        np.asarray(x[0:1])

    # warmup / compile
    res = run()
    sync(res.curv.K)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = run()
        sync(res.curv.K)
        times.append(time.perf_counter() - t0)
    t = min(times)
    throughput = N / t

    K = np.asarray(res.curv.K)[:N]
    exact_frac = float(np.asarray(res.exact)[:N].mean())
    Ka, Ha = analytic_curvatures("torus", pts)
    H = np.asarray(res.curv.H)[:N]
    # K is orientation-invariant -> direct relative error; H's sign follows
    # the reference's local sign-fix (no global orientation), so compare
    # magnitudes. Scale-normalized errors avoid the blow-up where the
    # analytic K crosses zero on the torus.
    scale = np.abs(Ka).max()
    relK = np.abs(K - Ka) / scale
    relH = np.abs(np.abs(H) - np.abs(Ha)) / np.abs(Ha)

    out = {
        "metric": "knn_quadric_curvature_1M_torus_points_per_sec_per_chip",
        "value": round(throughput, 1),
        "unit": "points/s",
        "vs_baseline": round(throughput / 6300.0, 2),
        "seconds_per_1M": round(t, 4),
        "k": K_NEIGHBORS,
        "knn_exact_fraction": round(exact_frac, 6),
        "nan_fraction": float(np.isnan(K).mean()),
        "median_scalerel_err_K_vs_analytic": float(np.median(relK)),
        "p99_scalerel_err_K_vs_analytic": float(np.quantile(relK, 0.99)),
        "max_scalerel_err_K_vs_analytic": float(np.max(relK)),
        "median_rel_err_absH_vs_analytic": float(np.median(relH)),
        "p99_rel_err_absH_vs_analytic": float(np.quantile(relH, 0.99)),
        "device": str(jax.devices()[0]),
    }
    # headline recorded NOW — secondaries can only add to it
    print(json.dumps(out), flush=True)

    def guarded(name, fn):
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — degrade, never zero the round
            out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]

    # --- secondary: multi-chip path on a mesh of 1 (the single-chip proxy
    # the environment allows for "sharding points across chips") ---
    def bench_sharded():
        from pct_tpu.distributed.sharding import make_mesh, sharded_curvature

        mesh1 = make_mesh(1)

        @jax.jit
        def step(points, num_points):
            cell = estimate_cell_size(points, num_points, K_NEIGHBORS)
            return sharded_curvature(mesh1, points, num_points, cell,
                                     k=K_NEIGHBORS, max_cells=mc,
                                     bucket_spec=spec)
        r = step(cloud.points, cloud.num_points)
        sync(r.curv.K)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            r = step(cloud.points, cloud.num_points)
            sync(r.curv.K)
            ts.append(time.perf_counter() - t0)
        out["seconds_per_1M_sharded_mesh1"] = round(min(ts), 4)
        out["sharded_mesh1_mean_abs_K"] = float(r.stats.mean_abs_K)

    guarded("sharded_mesh1", bench_sharded)

    # --- secondary: scans-class k=100 via the moment engine ---
    k100_layout = {}

    def probe_k100():
        cell100 = estimate_cell_size(cloud.points, cloud.num_points, 100)
        spec100, mc100 = probe_grid_buckets(
            build_grid(cloud.points, cloud.num_points, cell100),
            capacity_cap=400)
        k100_layout.update(spec=spec100, mc=mc100)

    guarded("k100_probe", probe_k100)

    def bench_k100():
        spec100, mc100 = k100_layout["spec"], k100_layout["mc"]

        def run_k100():
            cell = estimate_cell_size(cloud.points, cloud.num_points, 100)
            return fused_curvature(cloud.points, cloud.num_points, cell,
                                   k=100, max_cells=mc100,
                                   bucket_spec=spec100, engine="moments")

        r = run_k100()
        sync(r.curv.K)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            r = run_k100()
            sync(r.curv.K)
            ts.append(time.perf_counter() - t0)
        out["seconds_per_1M_k100_moments"] = round(min(ts), 4)
        out["k100_exact_fraction"] = round(
            float(np.asarray(r.exact)[:N].mean()), 6)
        K100 = np.asarray(r.curv.K)[:N]
        relK100 = np.abs(K100 - Ka) / scale
        out["k100_median_scalerel_err_K_vs_analytic"] = float(
            np.median(relK100))
        out["k100_p99_scalerel_err_K_vs_analytic"] = float(
            np.quantile(relK100, 0.99))
        out["k100_nan_fraction"] = float(np.isnan(K100).mean())

    guarded("k100_moments", bench_k100)

    # --- secondary: multi-chip moments engine on a mesh of 1 (the
    # scans-class k=100 path under the sharded layer; kernels are warm
    # in-process from bench_k100 — same bucket layout) ---
    def bench_sharded_k100():
        from pct_tpu.distributed.sharding import make_mesh, sharded_curvature

        spec100, mc100 = k100_layout["spec"], k100_layout["mc"]
        mesh1 = make_mesh(1)

        @jax.jit
        def step(points, num_points):
            cell = estimate_cell_size(points, num_points, 100)
            return sharded_curvature(mesh1, points, num_points, cell,
                                     k=100, max_cells=mc100,
                                     bucket_spec=spec100, engine="moments")

        r = step(cloud.points, cloud.num_points)
        sync(r.curv.K)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            r = step(cloud.points, cloud.num_points)
            sync(r.curv.K)
            ts.append(time.perf_counter() - t0)
        out["seconds_per_1M_k100_sharded_mesh1"] = round(min(ts), 4)
        out["k100_sharded_mesh1_mean_abs_K"] = float(r.stats.mean_abs_K)

    guarded("k100_sharded_mesh1", bench_sharded_k100)

    # --- secondary: library kNN, full (N,k) ids + distances (bucketed) ---
    def bench_library_knn():
        from pct_tpu.neighbors.cellknn import (
            compact_cells,
            knn_cellwise_bucketed,
        )

        def run_knn():
            cell = estimate_cell_size(cloud.points, cloud.num_points,
                                      K_NEIGHBORS)
            grid = build_grid(cloud.points, cloud.num_points, cell)
            cells = compact_cells(grid, mc)
            return knn_cellwise_bucketed(grid, cells, K_NEIGHBORS, spec,
                                         lean=False)

        r_knn = run_knn()
        sync(r_knn.dists[:, 0])
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            r_knn = run_knn()
            sync(r_knn.dists[:, 0])
            ts.append(time.perf_counter() - t0)
        out["seconds_per_1M_library_knn_full"] = round(min(ts), 4)

    guarded("library_knn", bench_library_knn)

    # --- secondary: implicit-quadric path at 1M (the reference's
    # secondary API, ref pointCloudToolbox.py:617-689 — SLSQP there,
    # closed-form 10x10 Gram smallest-eigenvector here) ---
    def bench_implicit():
        def run_imp():
            cell = estimate_cell_size(cloud.points, cloud.num_points,
                                      K_NEIGHBORS)
            return fused_curvature(cloud.points, cloud.num_points, cell,
                                   k=K_NEIGHBORS, max_cells=mc,
                                   bucket_spec=spec, method="implicit",
                                   implicit_mode="exact")

        r = run_imp()
        sync(r.curv.K)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            r = run_imp()
            sync(r.curv.K)
            ts.append(time.perf_counter() - t0)
        out["seconds_per_1M_implicit"] = round(min(ts), 4)
        Ki = np.asarray(r.curv.K)[:N]
        Hi = np.asarray(r.curv.H)[:N]
        relKi = np.abs(Ki - Ka) / scale
        relHi = np.abs(np.abs(Hi) - np.abs(Ha)) / np.abs(Ha)
        out["implicit_median_scalerel_err_K_vs_analytic"] = float(
            np.median(relKi))
        out["implicit_median_rel_err_absH_vs_analytic"] = float(
            np.median(relHi))
        out["implicit_nan_fraction"] = float(np.isnan(Ki).mean())

    guarded("implicit_1M", bench_implicit)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
