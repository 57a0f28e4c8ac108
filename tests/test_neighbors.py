import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from pct_tpu.core import from_numpy
from pct_tpu.neighbors import (
    build_grid,
    estimate_cell_size,
    knn_bruteforce,
    knn_cloud,
    knn_cloud_grid,
    knn_grid,
    ball_grid,
    mean_nn_distance,
)
from pct_tpu.shapes import generate_shape


def scipy_knn(pts, k):
    tree = cKDTree(pts)
    d, i = tree.query(pts, k=k + 1)
    return i[:, 1:], d[:, 1:]  # drop self (reference semantics)


@pytest.mark.parametrize("shape", ["sphere", "torus"])
def test_bruteforce_vs_scipy(shape):
    pts, _ = generate_shape(shape, 2000, radius=1.0)
    cloud = from_numpy(pts)
    k = 10
    idx, dist = knn_cloud(cloud, k=k)
    idx, dist = np.asarray(idx)[:2000], np.asarray(dist)[:2000]
    si, sd = scipy_knn(pts, k)
    np.testing.assert_allclose(dist, sd, rtol=1e-4, atol=1e-5)
    # index sets must match wherever the k-th distance is untied (regular
    # grids like the torus have exact distance ties -> arbitrary index pick)
    tree = cKDTree(pts)
    d2, _ = tree.query(pts, k=k + 2)
    untied = (d2[:, k + 1] - d2[:, k]) > 1e-5
    match = (np.sort(idx, axis=1) == np.sort(si, axis=1)).all(axis=1)
    assert match[untied].mean() > 0.999


def test_bruteforce_padding_ignored():
    pts, _ = generate_shape("sphere", 500, radius=1.0)
    c1 = from_numpy(pts, capacity=512)
    c2 = from_numpy(pts, capacity=2048)
    i1, d1 = knn_cloud(c1, k=8)
    i2, d2 = knn_cloud(c2, k=8)
    np.testing.assert_allclose(np.asarray(d1)[:500], np.asarray(d2)[:500],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1)[:500], np.asarray(i2)[:500])


@pytest.mark.parametrize("shape,k", [("sphere", 10), ("torus", 20),
                                     ("egg_carton", 20), ("cylinder", 30)])
def test_grid_knn_matches_bruteforce(shape, k):
    pts, _ = generate_shape(shape, 4000, radius=1.0)
    cloud = from_numpy(pts)
    res, grid = knn_cloud_grid(cloud, k=k)
    bi, bd = knn_cloud(cloud, k=k)
    n = 4000
    valid = np.asarray(res.valid)[:n]
    assert valid.all(), f"grid found only {valid.mean():.3f} of neighbors"
    np.testing.assert_allclose(np.asarray(res.dists)[:n], np.asarray(bd)[:n],
                               rtol=1e-4, atol=1e-5)


def test_grid_knn_nonuniform_density(rng):
    # two well-separated clusters at very different densities
    a = rng.standard_normal((3000, 3)).astype(np.float32) * 0.01
    b = rng.standard_normal((1000, 3)).astype(np.float32) * 1.0 + 5.0
    pts = np.concatenate([a, b])
    cloud = from_numpy(pts)
    # pathological for any fixed cell size; the certified-exact fallback
    # must still deliver brute-force-equal results
    res, _ = knn_cloud_grid(cloud, k=8)
    bi, bd = knn_cloud(cloud, k=8)
    n = pts.shape[0]
    assert np.asarray(res.exact)[:n].all()
    np.testing.assert_allclose(np.asarray(res.dists)[:n], np.asarray(bd)[:n],
                               rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("lean", [False, True])
def test_knn_cellwise_bucketed_matches_single(lean):
    """Bucketed library kNN (per-bucket statics + gather reorder) must
    reproduce the single-bucket cell-centric results exactly: same
    winners, same distances, same certificates."""
    from pct_tpu.neighbors.cellknn import (
        compact_cells,
        knn_cellwise,
        knn_cellwise_bucketed,
        probe_grid,
        probe_grid_buckets,
    )

    rng = np.random.default_rng(9)
    # nonuniform density -> multiple occupancy buckets
    a, _ = generate_shape("torus", 3000, radius=1.0)
    b = rng.standard_normal((1000, 3)).astype(np.float32) * 0.05
    pts = np.concatenate([a, b]).astype(np.float32)
    cloud = from_numpy(pts)
    n = pts.shape[0]
    k = 12
    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    cells_t, cap, mc, rc = probe_grid(grid)
    spec, mcb = probe_grid_buckets(grid)
    assert len(spec) > 1, "fixture must exercise multiple buckets"
    cells_b = compact_cells(grid, mcb)
    single = knn_cellwise(grid, cells_t, k, capacity=cap, cand_cap=rc,
                          lean=lean)
    buck = knn_cellwise_bucketed(grid, cells_b, k, tuple(spec), lean=lean)
    np.testing.assert_array_equal(np.asarray(buck.indices)[:n],
                                  np.asarray(single.indices)[:n])
    np.testing.assert_array_equal(np.asarray(buck.dists)[:n],
                                  np.asarray(single.dists)[:n])
    # certificates agree row-for-row (the dense blob exceeds capacity_cap
    # by design — BOTH paths must flag exactly those rows for repair)
    np.testing.assert_array_equal(np.asarray(buck.exact)[:n],
                                  np.asarray(single.exact)[:n])
    assert np.asarray(buck.exact)[:n].mean() > 0.9
    if not lean:
        np.testing.assert_array_equal(np.asarray(buck.valid)[:n],
                                      np.asarray(single.valid)[:n])
        # oracle: brute force distances. knn_cellwise rows are in SORTED
        # order (documented contract) — map through grid.order; only
        # certified rows are exact by construction
        bi, bd = knn_cloud(cloud, k=k)
        order = np.asarray(grid.order)[:n]
        e = np.asarray(buck.exact)[:n]
        np.testing.assert_allclose(np.asarray(buck.dists)[:n][e],
                                   np.asarray(bd)[order][e],
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pack", [16, 32])
def test_knn_cellwise_bucketed_larger_packs(pack, monkeypatch):
    """Candidate packing at pack > 8 must reproduce pack=8 results
    bit-exactly. Regression for the packed-run layout's alignment
    slack: ``_cand_m`` must widen M by the worst-case per-run group
    rounding (9·(2·pack-2)), or runs whose starts fall mid-group
    silently truncate; and the drop set on overflowing cells must be
    pack-independent (``_clip_runs`` against the pack-1 budget)."""
    from pct_tpu.neighbors import cellknn
    from pct_tpu.neighbors.cellknn import (
        compact_cells,
        knn_cellwise_bucketed,
        probe_grid_buckets,
    )

    rng = np.random.default_rng(9)
    a, _ = generate_shape("torus", 3000, radius=1.0)
    b = rng.standard_normal((1000, 3)).astype(np.float32) * 0.05
    pts = np.concatenate([a, b]).astype(np.float32)
    cloud = from_numpy(pts)
    n = pts.shape[0]
    k = 12
    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    spec, mcb = probe_grid_buckets(grid)
    assert any(sp.cand_cap % pack for sp in spec), \
        "fixture must exercise a cand_cap that is not a multiple of pack"
    cells_b = compact_cells(grid, mcb)
    base = knn_cellwise_bucketed(grid, cells_b, k, tuple(spec))
    monkeypatch.setattr(cellknn, "_cand_pack",
                        lambda m, _p=pack: _p if m % _p == 0 else 1)
    assert grid.sorted_points.shape[0] % pack == 0
    packed = knn_cellwise_bucketed(grid, cells_b, k, tuple(spec))
    np.testing.assert_array_equal(np.asarray(packed.indices)[:n],
                                  np.asarray(base.indices)[:n])
    np.testing.assert_array_equal(np.asarray(packed.dists)[:n],
                                  np.asarray(base.dists)[:n])
    np.testing.assert_array_equal(np.asarray(packed.exact)[:n],
                                  np.asarray(base.exact)[:n])


def test_grid_query_external_points():
    pts, _ = generate_shape("torus", 3000, radius=1.0)
    cloud = from_numpy(pts)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 10)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    queries = jnp.asarray(pts[:100] + 0.001)
    res = knn_grid(grid, queries, k=5, exclude_self=False)
    tree = cKDTree(pts)
    sd, si = tree.query(np.asarray(queries), k=5)
    np.testing.assert_allclose(np.asarray(res.dists), sd, rtol=1e-4, atol=1e-5)


def test_ball_query():
    pts, _ = generate_shape("sphere", 2000, radius=1.0)
    cloud = from_numpy(pts)
    radius = 0.15
    cell = jnp.float32(radius)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    res = ball_grid(grid, cloud.points[:200], jnp.float32(radius),
                    max_neighbors=64, capacity=96)
    tree = cKDTree(pts)
    counts = np.array([len(tree.query_ball_point(p, radius)) for p in pts[:200]])
    got = np.asarray(res.valid).sum(axis=1)
    np.testing.assert_array_equal(got, counts)


def test_mean_nn_distance():
    pts, _ = generate_shape("sphere", 2000, radius=1.0)
    cloud = from_numpy(pts)
    d = float(mean_nn_distance(cloud.points, cloud.num_points, sample=512))
    tree = cKDTree(pts)
    dd, _ = tree.query(pts, k=2)
    ref = dd[:, 1].mean()
    assert np.isclose(d, ref, rtol=0.15)


def test_runs_table_dense_matches_sort_branch():
    """The dense direct-addressed runs table must reproduce the sort-based
    searchsorted EXACTLY — including on a split_cells table, whose
    DUPLICATE cell ids must resolve to the first copy (side="left"
    semantics; the dense branch gets this from a scatter-min)."""
    import jax

    from pct_tpu.neighbors.cellknn import (_runs_table, compact_cells,
                                           split_cells)

    pts, _ = generate_shape("sphere", 4000, radius=1.0)
    rng = np.random.default_rng(3)
    pts = pts + 1e-4 * rng.standard_normal(pts.shape).astype(np.float32)
    cloud = from_numpy(pts)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 60)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    n = grid.sorted_points.shape[0]

    for cells in (compact_cells(grid, 1024),
                  split_cells(compact_cells(grid, 1024), n, 16, 8)):
        rs, rl = jax.jit(_runs_table)(grid, cells)

        # force the sort branch by making the dense cap unaffordable:
        # monkeypatch DENSE_CELLS down so total > dense_cap
        import pct_tpu.neighbors.cellknn as ck

        saved = ck.DENSE_CELLS
        try:
            ck.DENSE_CELLS = 1
            rs2, rl2 = jax.jit(_runs_table)(grid, cells)
        finally:
            ck.DENSE_CELLS = saved
        np.testing.assert_array_equal(np.asarray(rl), np.asarray(rl2))
        # run starts only matter where the run is non-empty
        nz = np.asarray(rl) > 0
        np.testing.assert_array_equal(np.asarray(rs)[nz], np.asarray(rs2)[nz])


def test_optimal_buckets_matches_bruteforce():
    """The DP threshold search must find the true optimum of the probe's
    cost model: compare achieved cost against exhaustive enumeration of
    8-aligned threshold subsets on random occupancy distributions."""
    from itertools import combinations

    from pct_tpu.neighbors.cellknn import _optimal_buckets

    def r8(x):
        return max(8, ((int(x) + 7) // 8) * 8)

    def spec_cost(key_s, spec, unit):
        lo_i, total = 0, 0.0
        for sp in spec:
            hi_i = int(np.searchsorted(key_s, sp.hi_key, side="right"))
            m = hi_i - lo_i
            size = ((m + unit - 1) // unit) * unit
            total += float(size) * sp.capacity * (sp.cand_cap + 32.0)
            assert sp.max_cells == size
            lo_i = hi_i
        assert lo_i == len(key_s), "spec must cover every cell"
        return total

    rng = np.random.default_rng(7)
    unit, cap_cap, mb = 16, 256, 4
    for trial in range(12):
        ncells = int(rng.integers(3, 120))
        counts = rng.integers(1, 300, size=ncells)
        tot = np.maximum(counts, rng.integers(1, 5000, size=ncells))
        key = np.maximum(counts, (tot + 26) // 27)
        order = np.argsort(key, kind="stable")
        key_s, counts_s, tot_s = key[order], counts[order], tot[order]

        spec = _optimal_buckets(key_s, counts_s, tot_s, cap_cap, mb, unit)
        got = spec_cost(key_s, spec, unit)

        # exhaustive optimum over the same candidate thresholds
        kmax = int(key_s[-1])
        cands = [c for c in range(8, r8(kmax) + 1, 8) if c < kmax]
        splits = {c: int(np.searchsorted(key_s, c, side="right"))
                  for c in cands}
        best = np.inf
        for nb in range(1, mb + 1):
            for inner in combinations(cands, nb - 1):
                idxs = [0] + [splits[c] for c in inner] + [len(key_s)]
                cost = 0.0
                for lo_i, hi_i in zip(idxs[:-1], idxs[1:]):
                    m = hi_i - lo_i
                    if m <= 0:
                        continue
                    cap = min(r8(counts_s[lo_i:hi_i].max()), cap_cap)
                    rc = r8(tot_s[lo_i:hi_i].max())
                    size = ((m + unit - 1) // unit) * unit
                    cost += float(size) * cap * (rc + 32.0)
                best = min(best, cost)
        assert got <= best + 1e-6, (trial, got, best)


def test_scatter_outputs_invert_matches_slab():
    """The invert+gather strategy of _scatter_outputs is semantically
    identical to the packed slab scatter: same zero-fill of uncovered
    destinations, same column unpacking, same non-f32 leaf handling."""
    from pct_tpu.neighbors import cellknn

    rng = np.random.default_rng(7)
    rows, n = 640, 400
    dest_np = np.full(rows, n, np.int64)
    slots = rng.choice(rows, size=300, replace=False)
    dest_np[slots] = rng.choice(n, size=300, replace=False)
    dest = jnp.asarray(dest_np.astype(np.int32))
    out = {
        "a": jnp.asarray(rng.standard_normal((rows, 3)).astype(np.float32)),
        "b": jnp.asarray(rng.standard_normal(rows).astype(np.float32)),
        "ids": jnp.asarray(rng.integers(0, 99, rows).astype(np.int32)),
    }
    exact = jnp.asarray(rng.random(rows) > 0.5)
    kth = jnp.asarray(rng.standard_normal(rows).astype(np.float32))

    res = {}
    for strat in ("slab", "invert"):
        res[strat] = cellknn._scatter_outputs(n, dest, out, exact, kth,
                                              strategy=strat)
    (o1, e1, k1), (o2, e2, k2) = res["slab"], res["invert"]
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    for key in out:
        np.testing.assert_array_equal(np.asarray(o1[key]),
                                      np.asarray(o2[key]))
    # uncovered destinations zero-fill in both
    covered = np.zeros(n, bool)
    covered[dest_np[dest_np < n]] = True
    assert not np.asarray(e2)[~covered].any()
    assert np.all(np.asarray(o2["a"])[~covered] == 0)
    assert np.all(np.asarray(o2["ids"])[~covered] == 0)
