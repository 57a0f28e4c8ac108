#!/usr/bin/env python
"""Stage-cost breakdown of the BUCKETED fused pipeline on the real TPU."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pct_tpu.core import from_numpy
    from pct_tpu.neighbors.bruteforce import mean_nn_distance
    from pct_tpu.neighbors.cellknn import (
        _bucket_tables, _tile_select, _working_set_guards, compact_cells,
        default_select_impl, probe_grid_buckets)
    from pct_tpu.neighbors.grid import PAD_ID, build_grid, estimate_cell_size
    from pct_tpu.pipeline.fused import fused_curvature
    from pct_tpu.shapes import generate_shape

    N = 1_000_000
    K = 20
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)
    cell0 = estimate_cell_size(cloud.points, cloud.num_points, K)
    spec, mc = probe_grid_buckets(
        build_grid(cloud.points, cloud.num_points, cell0))
    print("spec:", [(s.hi_key, s.capacity, s.cand_cap, s.max_cells)
                    for s in spec], "mc:", mc)

    p, npts = cloud.points, cloud.num_points

    def prefix(p, npts, upto, with_gather, with_select):
        cell = estimate_cell_size(p, npts, K)
        g = build_grid(p, npts, cell)
        cells = compact_cells(g, mc)
        tables = _bucket_tables(g, cells, spec)
        n = g.sorted_points.shape[0]
        acc = jnp.float32(0.0)
        for sp, (cid_b, start_b, count_b, rs_b, rl_b, lost) in zip(
                spec, tables):
            tc_b, impl_b = _working_set_guards(
                sp.capacity, 128, sp.cand_cap, default_select_impl())
            rl_b = jnp.minimum(rl_b, sp.cand_cap)
            pad = (-sp.max_cells) % tc_b
            ta = (
                jnp.pad(cid_b, (0, pad), constant_values=PAD_ID
                        ).reshape(-1, tc_b),
                jnp.pad(start_b, (0, pad), constant_values=n
                        ).reshape(-1, tc_b),
                jnp.pad(count_b, (0, pad)).reshape(-1, tc_b),
                jnp.pad(rs_b, ((0, pad), (0, 0))).reshape(-1, tc_b, 9),
                jnp.pad(rl_b, ((0, pad), (0, 0))).reshape(-1, tc_b, 9),
                jnp.zeros((sp.max_cells + pad,), bool).reshape(-1, tc_b),
            )

            def one_tile(args, capacity=sp.capacity, cand_cap=sp.cand_cap,
                         impl=impl_b):
                if not with_select:
                    cell_id, start, count, rs, run_len, _ = args
                    T = cell_id.shape[0]
                    slot = jnp.arange(cand_cap, dtype=jnp.int32)
                    cand = jnp.minimum(rs[..., :1] + slot[None, None, :], n - 1)
                    cand = cand.reshape(T, cand_cap)
                    cpts = g.sorted_points[cand]
                    qrow = jnp.minimum(
                        start[:, None] + jnp.arange(capacity,
                                                    dtype=jnp.int32), n - 1)
                    qpts = g.sorted_points[qrow]
                    return jnp.sum(cpts) + jnp.sum(qpts)
                # pack=1 matches the headline cellwise_tile_runner path
                pos, dists, found, _, cpts, qpts, qrow, ok_q, exact = \
                    _tile_select(g, args, K, capacity, cand_cap, impl,
                                 pack=1)
                if with_gather:
                    T = pos.shape[0]
                    nbrs = jnp.take_along_axis(
                        jnp.stack(cpts, axis=-1),
                        pos.reshape(T, -1)[:, :, None], axis=1
                    ).reshape(T, capacity, K, 3)
                    return (jnp.sum(nbrs) + jnp.sum(dists)
                            + jnp.sum(exact))
                return (jnp.sum(pos.astype(jnp.float32))
                        + jnp.sum(dists) + jnp.sum(exact))

            r = jax.lax.map(one_tile, ta)
            acc = acc + jnp.sum(r)
        return acc

    @jax.jit
    def s_gather_only(p, npts):
        return prefix(p, npts, "gather", False, False)

    @jax.jit
    def s_select(p, npts):
        return prefix(p, npts, "select", False, True)

    @jax.jit
    def s_select_nbrs(p, npts):
        return prefix(p, npts, "nbrs", True, True)

    @jax.jit
    def s_cellsize(p, npts):
        return estimate_cell_size(p, npts, K)

    @jax.jit
    def s_cellsize_512(p, npts):
        return 1.35 * mean_nn_distance(p, npts, sample=512, chunk=65536) \
            * jnp.sqrt(jnp.float32(K))

    @jax.jit
    def s_full(p, npts):
        cell = estimate_cell_size(p, npts, K)
        return fused_curvature(p, npts, cell, k=K, max_cells=mc,
                               bucket_spec=spec).curv.K.sum()

    def timeit(fn):
        out = fn(p, npts)
        np.asarray(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(p, npts)
            np.asarray(out)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for name, fn in [("cell_size(1024)", s_cellsize),
                     ("cell_size(512/64k)", s_cellsize_512),
                     ("buckets+gather", s_gather_only),
                     ("buckets+select", s_select),
                     ("buckets+select+nbrs", s_select_nbrs),
                     ("fused_full", s_full)]:
        print(f"{name:22s} {timeit(fn)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
