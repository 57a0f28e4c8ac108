"""Pallas kernel tests (interpreter mode on the CPU test mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pct_tpu.core import from_numpy
from pct_tpu.neighbors.cellknn import compact_cells, knn_cellwise, probe_grid
from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
from pct_tpu.ops.pallas_select import knn_select
from pct_tpu.shapes import generate_shape


def test_knn_select_matches_numpy(rng):
    T, C, M, K = 6, 8, 48, 5
    q = rng.standard_normal((T, C, 3)).astype(np.float32)
    p = rng.standard_normal((T, M, 3)).astype(np.float32)
    cand = rng.integers(0, 500, (T, M)).astype(np.int32)
    qrow = cand[:, :C].copy()          # force self-exclusion hits
    valid = (rng.random((T, M)) < 0.85).astype(np.int32)
    d, pos = knn_select(jnp.asarray(q), jnp.asarray(p), jnp.asarray(cand),
                        jnp.asarray(qrow), jnp.asarray(valid), K,
                        interpret=True)
    d, pos = np.asarray(d), np.asarray(pos)
    d2 = ((q[:, :, None, :] - p[:, None, :, :]) ** 2).sum(-1)
    ok = (valid[:, None, :] > 0) & (cand[:, None, :] != qrow[:, :, None])
    ref = np.sort(np.where(ok, d2, np.inf), axis=-1)[:, :, :K] ** 0.5
    fin = np.isfinite(ref)
    np.testing.assert_allclose(d[fin], ref[fin], rtol=1e-5, atol=1e-6)
    # positions index the same distances
    row = np.take_along_axis(np.where(ok, d2, np.inf), pos, axis=-1) ** 0.5
    np.testing.assert_allclose(row[fin], ref[fin], rtol=1e-5, atol=1e-6)
    # missing slots marked non-finite-ish
    assert (d[~fin] > 1e18).all()


def test_knn_select_coords_matches_select(rng):
    """The coords-emitting kernel must pick the same winners as the
    position-emitting kernel and return real candidate coordinates.
    (Distances compared allclose rather than bitwise — in interpret
    mode each kernel's d² inlines into a DIFFERENT enclosing XLA
    program, whose FMA contraction choices can differ by 1 ulp; same
    caveat as test_knn_select_rows_matches_numpy.)"""
    from pct_tpu.ops.pallas_select import knn_select_coords

    T, C, M, K = 6, 8, 48, 5
    q = rng.standard_normal((T, C, 3)).astype(np.float32)
    p = rng.standard_normal((T, M, 3)).astype(np.float32)
    cand = rng.integers(0, 500, (T, M)).astype(np.int32)
    qrow = cand[:, :C].copy()
    valid = (rng.random((T, M)) < 0.85).astype(np.int32)
    d, pos = knn_select(jnp.asarray(q), jnp.asarray(p), jnp.asarray(cand),
                        jnp.asarray(qrow), jnp.asarray(valid), K,
                        interpret=True)
    dc, nbrs = knn_select_coords(
        jnp.asarray(q), jnp.asarray(p), jnp.asarray(cand),
        jnp.asarray(qrow), jnp.asarray(valid), K, interpret=True)
    d, dc, nbrs = np.asarray(d), np.asarray(dc), np.asarray(nbrs)
    found = dc < 1e18
    np.testing.assert_allclose(dc[found], d[found], rtol=2e-6, atol=0)
    assert (dc[~found] > 1e18).all() and (d[~found] > 1e18).all()
    # every returned neighbor is bitwise SOME candidate point of its tile
    member = (nbrs[:, :, :, None, :] == p[:, None, None, :, :]).all(-1)
    assert member.any(-1).all()
    # ... and the kernel's distance is the distance to that neighbor
    recomputed = np.sqrt(((nbrs - q[:, :, None, :]) ** 2).sum(-1))
    np.testing.assert_allclose(recomputed[found], dc[found],
                               rtol=1e-5, atol=1e-6)


def test_knn_select_rows_matches_numpy(rng):
    """The rows-emitting kernel must return the k nearest candidates'
    global row ids with matching distances. (Compared against a numpy
    oracle rather than knn_select bitwise: the two kernels' d2 can
    differ by 1 ulp through different FMA contractions.)"""
    from pct_tpu.ops.pallas_select import knn_select_rows

    T, C, M, K = 6, 8, 48, 5
    q = rng.standard_normal((T, C, 3)).astype(np.float32)
    p = rng.standard_normal((T, M, 3)).astype(np.float32)
    # unique candidate ids per tile so row -> position is well-defined
    cand = np.stack([rng.permutation(500)[:M] for _ in range(T)]
                    ).astype(np.int32)
    qrow = cand[:, :C].copy()          # force self-exclusion hits
    valid = (rng.random((T, M)) < 0.85).astype(np.int32)
    dr, rows = knn_select_rows(
        jnp.asarray(q), jnp.asarray(p), jnp.asarray(cand),
        jnp.asarray(qrow), jnp.asarray(valid), K, interpret=True)
    dr, rows = np.asarray(dr), np.asarray(rows)
    d2 = ((q[:, :, None, :] - p[:, None, :, :]) ** 2).sum(-1)
    ok = (valid[:, None, :] > 0) & (cand[:, None, :] != qrow[:, :, None])
    ref = np.sort(np.where(ok, d2, np.inf), axis=-1)[:, :, :K] ** 0.5
    fin = np.isfinite(ref)
    np.testing.assert_allclose(dr[fin], ref[fin], rtol=1e-5, atol=1e-6)
    assert (dr[~fin] > 1e18).all()
    # each returned row id is a real candidate at the returned distance
    inv = np.full((T, 500), -1, np.int32)
    for t in range(T):
        inv[t, cand[t]] = np.arange(M)
    pos = inv[np.arange(T)[:, None, None], rows]
    assert (pos[fin] >= 0).all()
    row_d = np.take_along_axis(np.where(ok, d2, np.inf), pos, -1) ** 0.5
    np.testing.assert_allclose(row_d[fin], dr[fin], rtol=1e-5, atol=1e-6)


def test_apply_cellwise_coords_kernel_matches_ids_kernel():
    """apply_cellwise's in-kernel coordinate extraction must hand fn
    exactly sorted_points[idx] - query for the SAME winners the
    ids-emitting kernel picks (both interpret-mode: identical d2, so
    identical tie order — unlike the XLA path, whose MXU distance
    expansion can flip near-ties)."""
    from pct_tpu.neighbors.cellknn import apply_cellwise

    pts, _ = generate_shape("torus", 2000, radius=1.0)
    cloud = from_numpy(pts)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 10)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    cells, cap, mc, run_cap = probe_grid(grid)

    def fn(centered, found):
        return centered

    out, exact, kth = apply_cellwise(
        grid, cells, 10, fn, capacity=cap, cand_cap=run_cap,
        select_impl="pallas_interpret", dest_order="sorted")
    res = knn_cellwise(grid, cells, 10, capacity=cap, cand_cap=run_cap,
                       select_impl="pallas_interpret", original_ids=False)
    sp = np.asarray(grid.sorted_points)
    nv = int(np.asarray(grid.num_valid))
    idx = np.asarray(res.indices)[:nv]
    want = sp[idx] - sp[:nv, None, :]
    np.testing.assert_array_equal(np.asarray(out)[:nv], want)
    np.testing.assert_array_equal(np.asarray(exact)[:nv],
                                  np.asarray(res.exact)[:nv])
    np.testing.assert_array_equal(np.asarray(kth)[:nv],
                                  np.asarray(res.dists)[:nv, -1])


def test_cellwise_pallas_path_matches_xla():
    pts, _ = generate_shape("torus", 3000, radius=1.0)
    cloud = from_numpy(pts)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 12)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    cells, cap, mc, run_cap = probe_grid(grid)
    r_x = knn_cellwise(grid, cells, 12, capacity=cap, cand_cap=run_cap,
                       select_impl="xla")
    r_p = knn_cellwise(grid, cells, 12, capacity=cap, cand_cap=run_cap,
                       select_impl="pallas_interpret")
    n = 3000
    np.testing.assert_allclose(np.asarray(r_p.dists)[:n],
                               np.asarray(r_x.dists)[:n],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(r_p.exact)[:n],
                                  np.asarray(r_x.exact)[:n])
    assert np.asarray(r_p.exact)[:n].all()   # well-behaved torus: all certified


def test_moments_runner_interpret_matches_xla():
    """The TPU moments dispatch (moments_tile_runner -> knn_moments) run
    in interpret mode must match the XLA-impl runner. Covers the
    runner->kernel CALL PATH on CPU — the k=100 bench once broke on a
    stale kwarg in exactly this call while every kernel-level test
    (which invokes knn_moments directly) stayed green."""
    from pct_tpu.neighbors.cellknn import apply_cellwise, moments_tile_runner

    k = 48
    pts, _ = generate_shape("torus", 3000, radius=1.0)
    cloud = from_numpy(pts)
    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    cells, cap, mc, cand_cap = probe_grid(grid)
    outs = {}
    for impl in ("pallas_interpret", "xla"):
        outs[impl] = apply_cellwise(
            grid, cells, k, None, capacity=cap, cand_cap=cand_cap,
            select_impl=impl, dest_order="sorted",
            runner=moments_tile_runner)
    nv = int(np.asarray(grid.num_valid))
    (s_p, e_p, k_p), (s_x, e_x, k_x) = outs["pallas_interpret"], outs["xla"]
    assert np.asarray(e_p)[:nv].mean() > 0.99
    np.testing.assert_array_equal(np.asarray(e_p)[:nv], np.asarray(e_x)[:nv])
    np.testing.assert_allclose(np.asarray(s_p)[:nv], np.asarray(s_x)[:nv],
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_p)[:nv], np.asarray(k_x)[:nv],
                               rtol=1e-5, atol=1e-7)


def test_band_kernel_interpret_matches_xla():
    """DMA-band kNN (experimental: TPU-compile blocked on Mosaic DMA
    alignment; semantics locked in by this interpret-mode test)."""
    import jax.numpy as jnp

    from pct_tpu.experimental.band_knn import build_row_blocks, knn_cellwise_band
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size

    pts, _ = generate_shape("torus", 2500, radius=1.0)
    cloud = from_numpy(pts)
    k = 10
    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    cells, cap, mc, run_cap = probe_grid(grid)
    blocks = jnp.asarray(build_row_blocks(cells, 8))
    ref = knn_cellwise(grid, cells, k, capacity=cap, cand_cap=run_cap,
                       select_impl="xla", original_ids=False, lean=True)
    band = knn_cellwise_band(grid, cells, blocks, k, cap, bc=8,
                             interpret=True)
    n = 2500
    np.testing.assert_allclose(np.asarray(band.dists)[:n, 0],
                               np.asarray(ref.dists)[:n, 0],
                               rtol=1e-5, atol=1e-7)
    assert np.asarray(band.exact)[:n].all()
