import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pct_tpu.core import from_numpy
from pct_tpu.distributed.sharding import make_mesh, sharded_curvature
from pct_tpu.neighbors.grid import estimate_cell_size
from pct_tpu.pipeline.fused import fused_curvature
from pct_tpu.shapes import analytic_curvatures, generate_shape


@pytest.fixture(scope="module")
def torus_cloud():
    pts, _ = generate_shape("torus", 4000, radius=1.0)
    return pts, from_numpy(pts)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_curvature_matches_analytic(torus_cloud, n_devices):
    pts, cloud = torus_cloud
    mesh = make_mesh(n_devices)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 16)
    res = sharded_curvature(mesh, cloud.points, cloud.num_points, cell, k=16)
    K = np.asarray(res.curv.K)[:4000]
    Ka, _ = analytic_curvatures("torus", pts)
    strong = np.abs(Ka) > 0.5
    rel = np.abs(K[strong] - Ka[strong]) / np.abs(Ka[strong])
    assert np.median(rel) < 0.05
    assert float(res.stats.nan_fraction) == 0.0
    assert float(res.stats.mean_abs_K) > 0.5
    # coverage is certified per point, not assumed (ADVICE round 1)
    assert np.asarray(res.exact)[:4000].all()


def test_sharded_matches_single_device_exactly(torus_cloud):
    """The multi-chip path runs the SAME fused cell-centric tile body as
    the single-chip flagship — the mesh partition only changes which chip
    executes which tile, so every point's curvature must agree exactly
    (no tie-flip churn: identical candidate layout per cell => identical
    winners; rtol guards only against XLA fusion-level fp noise between
    the two compiled programs)."""
    pts, cloud = torus_cloud
    mesh = make_mesh(8)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 16)
    res = sharded_curvature(mesh, cloud.points, cloud.num_points, cell, k=16)
    single = fused_curvature(cloud.points, cloud.num_points, cell, k=16)
    K_sh = np.asarray(res.curv.K)[:4000]
    K_1 = np.asarray(single.curv.K)[:4000]
    match = np.isclose(K_sh, K_1, rtol=1e-5, atol=1e-7)
    assert match.mean() == 1.0
    np.testing.assert_array_equal(np.asarray(res.exact)[:4000],
                                  np.asarray(single.exact)[:4000])
    np.testing.assert_allclose(np.asarray(res.kth_dist)[:4000],
                               np.asarray(single.kth_dist)[:4000],
                               rtol=1e-6, atol=0)


def test_sharded_moments_matches_single_device(torus_cloud):
    """engine='moments' on the mesh: per-cell moment stats are computed
    independently per tile, so the stats layer (kth distance = sigma,
    exact certificate) must be BIT-identical to the single-chip moments
    engine. The moment->curvature epilogue is row-for-row but compiles
    inside shard_map in one program and as a single flat pass in the
    other — XLA fuses/FMA-contracts them differently, and the fit solve
    amplifies that to ~5e-6 scale-normalized on K (measured); gate at
    1e-4."""
    from pct_tpu.neighbors.cellknn import probe_grid_buckets
    from pct_tpu.neighbors.grid import build_grid

    pts, cloud = torus_cloud
    k = 64
    mesh = make_mesh(8)
    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    spec, mc, factor = probe_grid_buckets(
        grid, capacity_cap=max(256, 4 * k), split_to=128)
    res = sharded_curvature(mesh, cloud.points, cloud.num_points, cell,
                            k=k, max_cells=mc, bucket_spec=spec,
                            engine="moments", split=(128, factor))
    single = fused_curvature(cloud.points, cloud.num_points, cell, k=k,
                             max_cells=mc, bucket_spec=spec,
                             engine="moments", split=(128, factor))
    K_sh = np.asarray(res.curv.K)[:4000]
    K_1 = np.asarray(single.curv.K)[:4000]
    dn = np.abs(K_sh - K_1) / np.median(np.abs(K_1))
    assert dn.max() < 1e-4, f"epilogue divergence beyond fusion noise: {dn.max()}"
    np.testing.assert_array_equal(np.asarray(res.exact)[:4000],
                                  np.asarray(single.exact)[:4000])
    # stats layer must be BIT-identical across the partition
    np.testing.assert_array_equal(np.asarray(res.kth_dist)[:4000],
                                  np.asarray(single.kth_dist)[:4000])
    # coverage certified (accuracy-vs-analytic of the moments engine
    # itself is test_moments.py's job; k=64 of n=4000 is a deliberately
    # oversized neighborhood here, so fit bias vs analytic is large)
    assert np.asarray(res.exact)[:4000].all()
    assert float(res.stats.nan_fraction) == 0.0
    assert float(res.stats.mean_abs_K) > 0.5


def test_sharded_moments_rejects_implicit(torus_cloud):
    pts, cloud = torus_cloud
    mesh = make_mesh(2)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 16)
    with pytest.raises(ValueError, match="explicit"):
        sharded_curvature(mesh, cloud.points, cloud.num_points, cell,
                          k=16, engine="moments", method="implicit")


def test_graft_entry_and_dryrun():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    K = np.asarray(out.curv.K)
    assert np.isfinite(K[:4096]).all()
    g.dryrun_multichip(8)


def test_jit_of_sharded_step(torus_cloud):
    """The full multichip step must be jittable as one program."""
    pts, cloud = torus_cloud
    mesh = make_mesh(4)

    @jax.jit
    def step(points, num_points):
        cell = estimate_cell_size(points, num_points, 8)
        return sharded_curvature(mesh, points, num_points, cell, k=8)

    res = step(cloud.points, cloud.num_points)
    assert np.isfinite(float(res.stats.mean_abs_K))
