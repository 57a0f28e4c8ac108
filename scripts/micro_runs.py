#!/usr/bin/env python
"""Micro: runs-table strategies at 1M points (131k cells) on the TPU.

Compares the dense direct-addressed boundary map (scatter + reverse
cummin + gathers) at several static table sizes against the sort-based
searchsorted over the compact table.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from pct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pct_tpu.core import from_numpy
    from pct_tpu.neighbors.cellknn import (PAD_ID, _decode, compact_cells,
                                           probe_grid)
    from pct_tpu.neighbors.grid import MAXDIM, build_grid, estimate_cell_size
    from pct_tpu.shapes import generate_shape

    N = 1_000_000
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)
    p, npts = cloud.points, cloud.num_points
    cell = estimate_cell_size(p, npts, 20)
    grid = build_grid(p, npts, cell)
    cells, capacity, mc, run_cap = probe_grid(grid)
    cells = compact_cells(grid, mc)
    dims_np = np.asarray(grid.dims)
    print("dims:", dims_np, "total boxes:", int(np.prod(dims_np)),
          "cells:", int(np.asarray(cells.num_cells)))

    def prologue(cells, grid):
        cid = cells.cell_id
        dims = grid.dims
        ix, iy, iz = _decode(jnp.where(cid == PAD_ID, 0, cid))
        dyz = jnp.array([(dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)],
                        dtype=jnp.int32)
        ny = iy[:, None] + dyz[None, :, 0]
        nz = iz[:, None] + dyz[None, :, 1]
        ok = ((ny >= 0) & (ny < dims[1]) & (nz >= 0) & (nz < dims[2])
              & (cid != PAD_ID)[:, None])
        x_lo = jnp.maximum(ix - 1, 0)[:, None]
        x_hi = jnp.minimum(ix + 1, dims[0] - 1)[:, None]
        return ok, ny, nz, x_lo, x_hi

    def dense_impl(cells, grid, cap):
        nv = grid.num_valid
        dims = grid.dims
        total = dims[0] * dims[1] * dims[2]
        ok, ny, nz, x_lo, x_hi = prologue(cells, grid)
        kix, kiy, kiz = _decode(jnp.where(cells.cell_id == PAD_ID, 0,
                                          cells.cell_id))
        ckey = kix + dims[0] * (kiy + dims[1] * kiz)
        valid = cells.cell_id != PAD_ID
        table = jnp.full((cap,), 1, jnp.int32) * nv
        table = table.at[jnp.where(valid, ckey, cap)].set(
            cells.start, mode="drop")
        table = jax.lax.cummin(table, axis=0, reverse=True)
        row = dims[0] * (ny + dims[1] * nz)
        q_lo = row + x_lo
        q_hi1 = row + x_hi + 1
        rs = table[jnp.clip(q_lo, 0, cap - 1)]
        re = table[jnp.clip(q_hi1, 0, cap - 1)]
        re = jnp.where(q_hi1 >= total, nv, re)
        return jnp.where(ok, rs, 0), jnp.where(ok, re - rs, 0)

    def sort_impl(cells, grid):
        nv = grid.num_valid
        ok, ny, nz, x_lo, x_hi = prologue(cells, grid)
        base = ny * MAXDIM + nz * MAXDIM * MAXDIM
        lo = base + x_lo
        hi = base + x_hi
        start_ext = jnp.concatenate(
            [jnp.where(cells.cell_id == PAD_ID, nv, cells.start),
             jnp.full((1,), 1, jnp.int32) * nv])
        c_both = jnp.searchsorted(
            cells.cell_id, jnp.concatenate([lo, hi + 1], axis=1),
            side="left", method="sort")
        rs = start_ext[c_both[:, :9]]
        re = start_ext[c_both[:, 9:]]
        return jnp.where(ok, rs, 0), jnp.where(ok, re - rs, 0)

    def timeit(fn, n=5):
        r = fn(cells, grid)
        np.asarray(r[0]).reshape(-1)[:1]
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn(cells, grid)
            np.asarray(r[0]).reshape(-1)[:1]
            ts.append(time.perf_counter() - t0)
        return min(ts), r

    base_t, base_r = timeit(jax.jit(sort_impl))
    print(f"sort-based searchsorted  {base_t*1e3:8.2f} ms")
    for cap_log in (20, 21, 22, 23):
        cap = 1 << cap_log
        if cap < int(np.prod(dims_np)):
            print(f"dense 2^{cap_log}: table smaller than grid, skip")
            continue
        t, r = timeit(jax.jit(lambda c, g, cap=cap: dense_impl(c, g, cap)))
        same = (np.array_equal(np.asarray(r[0]), np.asarray(base_r[0]))
                and np.array_equal(np.asarray(r[1]), np.asarray(base_r[1])))
        print(f"dense 2^{cap_log}              {t*1e3:8.2f} ms   "
              f"match={same}")


if __name__ == "__main__":
    main()
