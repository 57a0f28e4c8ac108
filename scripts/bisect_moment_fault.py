"""Bisect the round-5 deterministic moment-kernel device fault.

sweep_r5_200k_perturbed.csv: the sphere-Perturbed-r=10 row faults the
TPU (~122 s into the row, twice, in _prime_moment_kernels ->
knn_moments(zeros)). Priming is data-independent, so the fault is a
function of (bucket static shapes, k) only. This script reproduces the
exact spec probe on the SAME cloud, then primes each bucket's kernel
ONE AT A TIME, printing before/after — the first bucket that kills the
device names the hostile static.

Run: python scripts/bisect_moment_fault.py [bucket_index_to_start]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pct_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np


def main(start=0):
    import jax

    from pct_tpu.core import from_numpy
    from pct_tpu.neighbors.cellknn import (_cand_m, _cand_pack,
                                           probe_grid_buckets)
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
    from pct_tpu.ops.pallas_moments import knn_moments
    from pct_tpu.shapes import analytic_area, generate_shape

    k = 50
    amp = 0.001 * np.sqrt(analytic_area("sphere", 10.0))
    _, pert = generate_shape("sphere", 200_000, radius=10.0,
                             perturbation_strength=amp, seed=0)
    cloud = from_numpy(pert)
    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    spec, mc, factor = probe_grid_buckets(grid, capacity_cap=max(256, 4 * k),
                                          split_to=128)
    print("factor:", factor, "buckets:", [(sp.capacity, sp.cand_cap,
                                           sp.max_cells) for sp in spec],
          flush=True)
    dtype = jnp.float32
    pack = _cand_pack(cloud.points.shape[0])
    print("pack:", pack, flush=True)
    for i, sp in enumerate(spec):
        if i < int(start):
            continue
        m = _cand_m(sp.cand_cap, pack)
        t_cells = sp.max_cells
        print(f"[{i}] priming C={sp.capacity} m={m} cells={t_cells} "
              f"k={k} ...", flush=True)
        t0 = time.time()
        z3 = jnp.zeros((t_cells, sp.capacity, 3), dtype)
        c3 = jnp.zeros((t_cells, m, 3), dtype)
        icand = jnp.full((t_cells, m), -2, jnp.int32)
        irow = jnp.full((t_cells, sp.capacity), -1, jnp.int32)
        ival = jnp.zeros((t_cells, m), jnp.int32)
        out = knn_moments(z3, c3, icand, irow, ival, k)
        _ = np.asarray(out[:1, :1, :1])
        print(f"[{i}] OK {time.time() - t0:.1f}s", flush=True)
    print("ALL BUCKETS OK", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
