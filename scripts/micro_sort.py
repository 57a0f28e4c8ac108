#!/usr/bin/env python
"""Micro: grid-build sort strategies at 1M points on the real TPU.

Current build_grid does argsort(ids) then TWO gathers (points[order],
ids[order]). Variants tried here:
  A. current: stable argsort + row gather + id gather
  B. one multi-operand lax.sort carrying (ids, order, px, py, pz)
  C. one multi-operand lax.sort carrying (ids, order) + row gather
Each returns checksums so XLA can't DCE the work.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def timeit(fn, n=5):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:1]
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from pct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pct_tpu.core import from_numpy
    from pct_tpu.neighbors.grid import (PAD_ID, cell_coords, grid_geometry,
                                        linearize, quantize_ids,
                                        estimate_cell_size)
    from pct_tpu.shapes import generate_shape

    N = 1_000_000
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)
    p, npts = cloud.points, cloud.num_points
    cell = estimate_cell_size(p, npts, 20)

    def prologue(points, num_points, cell_size):
        n = points.shape[0]
        valid = jnp.arange(n, dtype=jnp.int32) < num_points
        big = jnp.float32(jnp.inf)
        lo = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
        hi = jnp.max(jnp.where(valid[:, None], points, -big), axis=0)
        origin, dims, cell_size = grid_geometry(lo, hi, cell_size)
        ids = quantize_ids(points, valid, origin, cell_size, dims)
        return ids

    @jax.jit
    def variant_a(points, num_points, cell_size):
        ids = prologue(points, num_points, cell_size)
        order = jnp.argsort(ids, stable=True).astype(jnp.int32)
        sp = points[order]
        si = ids[order]
        return jnp.sum(sp), jnp.sum(si), jnp.sum(order)

    @jax.jit
    def variant_b(points, num_points, cell_size):
        ids = prologue(points, num_points, cell_size)
        n = points.shape[0]
        iota = jnp.arange(n, dtype=jnp.int32)
        si, order, px, py, pz = jax.lax.sort(
            (ids, iota, points[:, 0], points[:, 1], points[:, 2]),
            num_keys=1, is_stable=True)
        sp = jnp.stack([px, py, pz], axis=-1)
        return jnp.sum(sp), jnp.sum(si), jnp.sum(order)

    @jax.jit
    def variant_c(points, num_points, cell_size):
        ids = prologue(points, num_points, cell_size)
        n = points.shape[0]
        iota = jnp.arange(n, dtype=jnp.int32)
        si, order = jax.lax.sort((ids, iota), num_keys=1, is_stable=True)
        sp = points[order]
        return jnp.sum(sp), jnp.sum(si), jnp.sum(order)

    for name, fn in [("A argsort+2gather", variant_a),
                     ("B 5-operand sort", variant_b),
                     ("C 2-op sort+gather", variant_c)]:
        t = timeit(lambda fn=fn: fn(p, npts, cell))
        print(f"{name:22s} {t*1e3:8.2f} ms")
        # cross-check results agree
    a = jax.jit(variant_a)(p, npts, cell)
    b = jax.jit(variant_b)(p, npts, cell)
    print("sum check:", [float(np.asarray(x)) for x in a],
          [float(np.asarray(x)) for x in b])


if __name__ == "__main__":
    main()
