"""Moment-based curvature (large-k path) vs the direct list-based chain.

The moment path must reproduce tangent_frames + fit_quadratic +
explicit_curvatures from order-invariant sums alone — same neighborhoods
in, near-identical curvature out (preconditioning differs: RMS vs max
anisotropic scaling, so agreement is tight-tolerance, not bitwise).
"""

import numpy as np
import pytest

from pct_tpu.core import from_numpy
from pct_tpu.neighbors.knn import knn_cloud_grid
from pct_tpu.pipeline.curvature_pipeline import pointwise_curvature
from pct_tpu.shapes import analytic_curvatures, generate_shape


def _moment_curvature_from_lists(pts_np, cloud, k):
    import jax.numpy as jnp

    from pct_tpu.fit.moments import (
        curvature_from_moments,
        neighborhood_moments,
    )

    res, _ = knn_cloud_grid(cloud, k)
    n = int(cloud.num_points)
    centered = cloud.points[res.indices] - cloud.points[:, None, :]
    weights = res.valid.astype(jnp.float32)
    sigma = res.dists[:, k - 1]
    m = neighborhood_moments(centered, weights, sigma)
    curv, normals = curvature_from_moments(
        m, sigma, centered[:, 0, :], centered[:, k - 1, :])
    return res, centered, curv, normals, n


@pytest.mark.parametrize("shape,k", [("torus", 24), ("sphere", 16)])
def test_moment_path_matches_direct_chain(shape, k):
    pts, _ = generate_shape(shape, 3000, radius=1.0)
    cloud = from_numpy(pts)
    res, centered, curv_m, normals_m, n = _moment_curvature_from_lists(
        pts, cloud, k)
    curv_d, normals_d, _ = pointwise_curvature(cloud.points, res.indices)
    K_m = np.asarray(curv_m.K)[:n]
    K_d = np.asarray(curv_d.K)[:n]
    H_m = np.asarray(curv_m.H)[:n]
    H_d = np.asarray(curv_d.H)[:n]
    scale = np.abs(K_d).max()
    assert np.median(np.abs(K_m - K_d)) / scale < 2e-3
    assert np.quantile(np.abs(K_m - K_d) / scale, 0.99) < 3e-2
    assert np.median(np.abs(H_m - H_d)) / np.abs(H_d).max() < 2e-3
    # normals agree including the sign fix
    dots = np.sum(np.asarray(normals_m)[:n] * np.asarray(normals_d)[:n], -1)
    assert (dots > 0.999).mean() > 0.999


def test_moment_path_matches_analytic():
    pts, _ = generate_shape("torus", 4000, radius=1.0)
    cloud = from_numpy(pts)
    _, _, curv, _, n = _moment_curvature_from_lists(pts, cloud, 20)
    K = np.asarray(curv.K)[:n]
    Ka, _ = analytic_curvatures("torus", pts)
    strong = np.abs(Ka) > 0.5
    rel = np.abs(K[strong] - Ka[strong]) / np.abs(Ka[strong])
    assert np.median(rel) < 0.05


def test_fractional_tie_weights_stay_finite():
    """Duplicated / tied neighborhoods must produce finite moments and
    curvature (clamping guards the w=0 far candidates)."""
    import jax.numpy as jnp

    from pct_tpu.fit.moments import (
        curvature_from_moments,
        neighborhood_moments,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal((1, 8, 3)).astype(np.float32)
    centered = jnp.asarray(np.concatenate([base, base], axis=1))  # exact ties
    w = jnp.full((1, 16), 0.5)                                    # fractional
    sigma = jnp.linalg.norm(centered, axis=-1).max(-1)
    m = neighborhood_moments(centered, w, sigma)
    curv, nrm = curvature_from_moments(m, sigma, centered[:, 0],
                                       centered[:, -1])
    assert np.isfinite(np.asarray(curv.K)).all()
    assert np.isfinite(np.asarray(nrm)).all()


def test_fused_moments_engine_matches_staged_large_k():
    """fused_curvature(engine='moments') = the large-k flagship path —
    neighborhood sets must match the staged query-centric path exactly
    (no distance ties on this random-ish cloud), curvature to tight
    tolerance (RMS vs max preconditioning)."""
    import jax.numpy as jnp

    from pct_tpu.neighbors.grid import estimate_cell_size
    from pct_tpu.pipeline.fused import fast_curvature, fused_curvature

    k = 96
    pts, _ = generate_shape("sphere", 5000, radius=1.0)
    rng = np.random.default_rng(11)
    pts = pts + 1e-4 * rng.standard_normal(pts.shape).astype(np.float32)
    cloud = from_numpy(pts)
    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    res_m = fused_curvature(cloud.points, cloud.num_points, cell, k=k,
                            engine="moments")
    n = int(cloud.num_points)
    assert np.asarray(res_m.exact)[:n].mean() > 0.99
    # staged oracle on the same neighborhoods
    res, _ = knn_cloud_grid(cloud, k)
    curv_d, _, _ = pointwise_curvature(cloud.points, res.indices)
    e = np.asarray(res_m.exact)[:n]
    K_m = np.asarray(res_m.curv.K)[:n][e]
    K_d = np.asarray(curv_d.K)[:n][e]
    scale = np.abs(K_d).max()
    assert np.median(np.abs(K_m - K_d)) / scale < 2e-3
    assert np.quantile(np.abs(K_m - K_d) / scale, 0.99) < 3e-2
    # kth distance agrees with the staged path's kth neighbor distance
    np.testing.assert_allclose(np.asarray(res_m.kth_dist)[:n][e],
                               np.asarray(res.dists)[:n, -1][e], rtol=1e-5)
    # fast_curvature routes large-k through the moment engine and returns
    # the same result
    res_f = fast_curvature(cloud, k=k)
    K_f = np.asarray(res_f.curv.K)[:n][e]
    np.testing.assert_allclose(K_f, K_m, rtol=1e-4, atol=1e-6)


def test_chunked_epilogue_matches_unchunked():
    """curvature_from_moments_chunked must match the unchunked call
    across chunk boundaries (incl. a non-dividing chunk size — pad rows
    are dropped). Tight tolerance, not bitwise: XLA fuses the chunked
    map body differently, changing FP rounding order. This is the guard
    for the round-2 OOM fix: the epilogue runs in N-chunks on device."""
    from pct_tpu.fit.moments import (
        curvature_from_moments,
        curvature_from_moments_chunked,
    )

    pts, _ = generate_shape("torus", 1000, radius=1.0)
    cloud = from_numpy(pts)
    k = 20
    import jax.numpy as jnp

    res, _ = knn_cloud_grid(cloud, k)
    centered = cloud.points[res.indices] - cloud.points[:, None, :]
    weights = res.valid.astype(jnp.float32)
    sigma = res.dists[:, k - 1]
    from pct_tpu.fit.moments import neighborhood_moments

    m = neighborhood_moments(centered, weights, sigma)
    full = curvature_from_moments(m, sigma, centered[:, 0, :],
                                  centered[:, k - 1, :])
    chunked = curvature_from_moments_chunked(
        m, sigma, centered[:, 0, :], centered[:, k - 1, :], chunk=96)
    for a, b in zip(full[0], chunked[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4, equal_nan=True)
    np.testing.assert_allclose(np.asarray(full[1]), np.asarray(chunked[1]),
                               rtol=1e-3, atol=1e-4, equal_nan=True)


def test_rotated_moments_tensor_matches_symbolic():
    """The einsum-contraction rotated_moments must equal the symbolic
    per-term expansion (the latter is the mathematical definition; the
    former is what ships — ~50 HLO ops instead of ~5k)."""
    import jax.numpy as jnp

    from pct_tpu.fit.frames import rodrigues_to_z
    from pct_tpu.fit.moments import (
        neighborhood_moments,
        rotated_moments,
        rotated_moments_symbolic,
    )

    rng = np.random.default_rng(5)
    centered = jnp.asarray(rng.standard_normal((32, 12, 3)).astype(np.float32))
    w = jnp.asarray((rng.random((32, 12)) < 0.8).astype(np.float32))
    sigma = jnp.linalg.norm(centered, axis=-1).max(-1)
    m = neighborhood_moments(centered, w, sigma)
    nrm = rng.standard_normal((32, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    R = rodrigues_to_z(jnp.asarray(nrm))
    S_t = rotated_moments(m, R)
    S_s = rotated_moments_symbolic(m, R)
    assert set(S_t) == set(S_s)
    for key in S_s:
        np.testing.assert_allclose(np.asarray(S_t[key]),
                                   np.asarray(S_s[key]),
                                   rtol=2e-5, atol=2e-5, err_msg=str(key))


def test_split_cells_moments_matches_unsplit():
    """Virtual cell splitting (Mosaic compile guard for capacity > 128,
    neighbors.cellknn.split_cells) is a pure layout change: the split
    and unsplit moments pipelines must agree exactly on certified rows,
    and the split probe's spec must cap every bucket at split_to."""
    from pct_tpu.neighbors.cellknn import probe_grid_buckets, split_cells, \
        compact_cells
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
    from pct_tpu.pipeline.fused import fused_curvature

    k = 72
    # sparse shell + one dense cluster => the cluster cell holds a few
    # hundred points, over the 128-query split threshold
    rng = np.random.default_rng(3)
    shell, _ = generate_shape("sphere", 1000, radius=1.0)
    cluster = (0.02 * rng.standard_normal((320, 3)) + 0.5).astype(np.float32)
    pts = np.concatenate([np.asarray(shell, np.float32), cluster])
    cloud = from_numpy(pts)
    n = int(cloud.num_points)

    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    spec_s, mc_s, factor = probe_grid_buckets(grid, capacity_cap=4 * k,
                                              split_to=128)
    assert factor > 1, "fixture must actually trigger a split"
    assert all(sp.capacity <= 128 for sp in spec_s)

    # split_cells invariant: the per-cell query ranges tile the originals
    cells = compact_cells(grid, mc_s)
    sc = split_cells(cells, grid.sorted_points.shape[0], 128, factor)
    assert int(np.asarray(sc.max_count)) <= 128
    nc, nc_s = int(np.asarray(cells.num_cells)), int(np.asarray(sc.num_cells))
    rows = {(int(i), int(s), int(c)) for i, s, c in zip(
        np.asarray(cells.cell_id)[:nc], np.asarray(cells.start)[:nc],
        np.asarray(cells.count)[:nc])}
    merged = {}
    for i, s, c in zip(np.asarray(sc.cell_id)[:nc_s],
                       np.asarray(sc.start)[:nc_s],
                       np.asarray(sc.count)[:nc_s]):
        key = int(i)
        lo, hi = merged.get(key, (int(s), int(s)))
        assert int(s) == hi or int(s) < hi  # contiguous, ordered copies
        merged[key] = (min(lo, int(s)), max(hi, int(s) + int(c)))
    assert {(i, lo, hi - lo) for i, (lo, hi) in merged.items()} == rows

    # unclipped capacity_cap: with the default 4k cap the cluster cell's
    # rows beyond the cap get NO query slots (exact=False, zero output)
    # in the unsplit layout — the split layout covers them, an extra win
    # (on real TPUs that unsplit capacity static would also be in the
    # pathological Mosaic compile class; CPU runs the XLA path)
    spec_u, mc_u = probe_grid_buckets(grid, capacity_cap=512)
    r_split = fused_curvature(cloud.points, cloud.num_points, cell, k=k,
                              max_cells=mc_s, bucket_spec=spec_s,
                              engine="moments", split=(128, factor))
    r_unsplit = fused_curvature(cloud.points, cloud.num_points, cell, k=k,
                                max_cells=mc_u, bucket_spec=spec_u,
                                engine="moments")
    # the certificates must agree row-for-row (the dense cluster's rows
    # are uncovered in BOTH layouts — a geometric property of the 3^3
    # window at this k, not a split artifact)
    np.testing.assert_array_equal(np.asarray(r_split.exact)[:n],
                                  np.asarray(r_unsplit.exact)[:n])
    e = np.asarray(r_split.exact)[:n] & np.asarray(r_unsplit.exact)[:n]
    assert e.mean() > 0.5 and e.sum() > 500
    np.testing.assert_allclose(np.asarray(r_split.curv.K)[:n][e],
                               np.asarray(r_unsplit.curv.K)[:n][e],
                               rtol=2e-4, atol=1e-5)


def test_moment_kernel_matches_xla_oracle_sparse_rows():
    """knn_moments (interpret) vs the XLA oracle on a tile mix that
    exercises all three row classes: found (>= k valid candidates),
    under-k (0 < valid < k, tau must converge to the max valid d² —
    the seeded-bisection contract), and empty (no valid candidate at
    all, tau must be exactly 0)."""
    import jax.numpy as jnp

    from pct_tpu.ops.pallas_moments import knn_moments, xla_moment_stats

    rng = np.random.default_rng(7)
    T, C, M, K = 4, 8, 192, 20
    q = rng.standard_normal((T, C, 3)).astype(np.float32)
    p = rng.standard_normal((T, M, 3)).astype(np.float32)
    cand = np.stack([rng.permutation(4096)[:M] for _ in range(T)]
                    ).astype(np.int32)
    qrow = cand[:, :C].copy()          # force self-exclusion hits
    valid = (rng.random((T, M)) < 0.8).astype(np.int32)
    valid[1, 5:] = 0                   # tile 1: every row under-k
    valid[2, :] = 0                    # tile 2: empty rows
    out = np.asarray(knn_moments(
        jnp.asarray(q), jnp.asarray(p), jnp.asarray(cand),
        jnp.asarray(qrow), jnp.asarray(valid), K, interpret=True))
    ref = np.asarray(xla_moment_stats(
        jnp.asarray(q), jnp.asarray(p), jnp.asarray(cand),
        jnp.asarray(qrow), jnp.asarray(valid), K))
    found = out[:, :, 45] > 0
    assert found[0].any() and not found[1].any() and not found[2].any()
    assert (out[2, :, 35] == 0.0).all()          # empty rows: tau == 0
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("strategy", ["invert", "invert_late"])
def test_fused_moments_scatter_strategies_match(strategy):
    """The three output-move strategies (slab scatter / invert+gather /
    invert-then-epilogue) are semantically identical through the REAL
    fused moments path: same curvature, normals, exact mask, kth
    distance — including zero-fill of the padding tail (invert_late
    must not leak epilogue(0) values into uncovered rows)."""
    import jax.numpy as jnp  # noqa: F401

    from pct_tpu.neighbors.grid import estimate_cell_size
    from pct_tpu.pipeline.fused import fused_curvature

    k = 72
    pts, _ = generate_shape("torus", 3000, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1024)
    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    base = fused_curvature(cloud.points, cloud.num_points, cell, k=k,
                           engine="moments", scatter_strategy="slab")
    alt = fused_curvature(cloud.points, cloud.num_points, cell, k=k,
                          engine="moments", scatter_strategy=strategy)
    np.testing.assert_array_equal(np.asarray(base.exact),
                                  np.asarray(alt.exact))
    np.testing.assert_array_equal(np.asarray(base.kth_dist),
                                  np.asarray(alt.kth_dist))
    for fld in ("K", "H", "k1", "k2", "H_sq"):
        np.testing.assert_array_equal(np.asarray(getattr(base.curv, fld)),
                                      np.asarray(getattr(alt.curv, fld)))
    np.testing.assert_array_equal(np.asarray(base.normals),
                                  np.asarray(alt.normals))
    # padding tail stays zero under every strategy
    n = int(cloud.num_points)
    assert np.all(np.asarray(alt.curv.K)[n:] == 0)
    assert np.all(np.asarray(alt.normals)[n:] == 0)
    assert not np.asarray(alt.exact)[n:].any()


def test_chunk_rounding_avoids_hostile_896():
    """Round-5 device-fault regression: the k=50 moment kernel at
    (C=128, m=1560) chose chunk=896 (7x128 lanes) and deterministically
    faulted the TPU (sweep_r5_200k_perturbed, scripts/
    bisect_moment_fault.py). Chunks must be 256-multiples now — the
    faulting m values map onto the proven 768/1024 programs."""
    def chosen_chunk(m, chunk=1024):
        g_min = -(-m // chunk)
        per = -(-m // g_min)
        return -(-per // 256) * 256

    for m in (1560, 1552, 1544, 1680, 2040, 2200, 1432):
        c = chosen_chunk(m)
        assert c % 256 == 0 and c != 896, (m, c)


def test_moments_kernel_at_faulting_static_interpret():
    """The exact round-5 faulting static (C=128, m=1560, k=50) must
    match the XLA oracle through the interpreter with the new
    256-multiple chunking."""
    import jax.numpy as jnp

    from pct_tpu.ops.pallas_moments import knn_moments, xla_moment_stats

    rng = np.random.default_rng(3)
    T, C, M, K = 2, 128, 1560, 50
    q = jnp.asarray(rng.standard_normal((T, C, 3)).astype(np.float32))
    p = jnp.asarray(rng.standard_normal((T, M, 3)).astype(np.float32))
    cand = jnp.asarray(
        np.stack([rng.permutation(4096)[:M] for _ in range(T)])
        .astype(np.int32))
    qrow = cand[:, :C]
    valid = jnp.asarray((rng.random((T, M)) < 0.9).astype(np.int32))
    got = np.asarray(knn_moments(q, p, cand, qrow, valid, K,
                                 interpret=True))
    want = np.asarray(xla_moment_stats(q, p, cand, qrow, valid, K))
    np.testing.assert_allclose(got[..., :35], want[..., :35],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[..., 38], want[..., 38],
                               rtol=1e-5, atol=1e-7)   # sigma
    np.testing.assert_array_equal(got[..., 45], want[..., 45])  # found
