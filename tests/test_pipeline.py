import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from pct_tpu.core import from_numpy
from pct_tpu.pipeline import (
    curvature_pipeline,
    explicit_quadratic_neighbor_study,
    pointwise_curvature,
)
from pct_tpu.shapes import analytic_curvatures, generate_shape
from tests.reference_oracle import reference_explicit_chain


def test_explicit_pipeline_sphere():
    pts, _ = generate_shape("sphere", 2000, radius=1.0)
    cloud = from_numpy(pts)
    r = curvature_pipeline(cloud, k=20, method="explicit", tile=1024)
    n = 2000
    K = np.asarray(r.curv.K)[:n]
    H = np.asarray(r.curv.H)[:n]
    Ka, Ha = analytic_curvatures("sphere", pts)
    # method (truncation) error dominates at N=2000/k=20: ~2% K bias —
    # the reference's own chain shows the same (see the oracle-match test)
    assert np.median(np.abs(K - Ka) / Ka) < 0.04
    assert np.median(np.abs(H - Ha) / Ha) < 0.04
    assert abs(np.mean(K) - 1.0) < 0.05
    assert abs(np.mean(H) - 1.0) < 0.05


def test_explicit_pipeline_matches_reference_chain():
    """Fused f32 TPU chain vs independent f64 numpy oracle of the
    reference algorithm, on identical neighbor sets."""
    pts, _ = generate_shape("torus", 1500, radius=1.0)
    cloud = from_numpy(pts)
    tree = cKDTree(pts)
    _, idx = tree.query(pts, k=21)
    idx = idx[:, 1:].astype(np.int32)
    curv, normals, coeffs = pointwise_curvature(
        cloud.points, jnp.asarray(idx), method="explicit", tile=512
    )
    K = np.asarray(curv.K)
    H = np.asarray(curv.H)
    K_ref, H_ref, n_ref = reference_explicit_chain(pts, idx)
    scale = np.abs(K_ref).max()
    assert np.median(np.abs(K - K_ref)) / scale < 1e-4
    assert np.quantile(np.abs(K - K_ref) / scale, 0.99) < 1e-2
    hscale = np.abs(H_ref).max()
    assert np.median(np.abs(H - H_ref)) / hscale < 1e-4
    # normals agree including the sign-fix
    dots = np.abs(np.sum(np.asarray(normals)[: len(pts)] * n_ref, axis=1))
    assert np.median(dots) > 0.9999
    sign_agree = (np.sum(np.asarray(normals)[: len(pts)] * n_ref, axis=1) > 0)
    assert sign_agree.mean() > 0.99


def test_explicit_pipeline_torus_pointwise():
    pts, _ = generate_shape("torus", 4000, radius=1.0)
    cloud = from_numpy(pts)
    r = curvature_pipeline(cloud, k=20, tile=1024)
    n = 4000
    K = np.asarray(r.curv.K)[:n]
    Ka, _ = analytic_curvatures("torus", pts)
    # K spans negative (inner) to positive (outer); sign agreement
    strong = np.abs(Ka) > 0.5
    assert (np.sign(K[strong]) == np.sign(Ka[strong])).mean() > 0.97
    # relative error where curvature is significant
    rel = np.abs(K[strong] - Ka[strong]) / np.abs(Ka[strong])
    assert np.median(rel) < 0.05


def test_implicit_pipeline_sphere():
    pts, _ = generate_shape("sphere", 2000, radius=2.0)
    cloud = from_numpy(pts)
    r = curvature_pipeline(cloud, k=40, method="implicit", tile=1024)
    K = np.asarray(r.curv.K)[:2000]
    np.testing.assert_allclose(np.median(K), 0.25, rtol=0.05)


def test_neighbor_study_sphere():
    pts, _ = generate_shape("sphere", 2000, radius=1.0)
    cloud = from_numpy(pts)
    k_rec, per_sample = explicit_quadratic_neighbor_study(
        cloud, tol=1e-4, sample_size=64, kmax=40
    )
    k_rec = int(k_rec)
    assert 4 <= k_rec <= 41
    per = np.asarray(per_sample)
    assert (per[per > 0] >= 3).all()


def test_neighbor_study_nonconverged_push_mean_high():
    """Reference parity (ref pointCloudToolbox.py:790-791): samples that
    never converge contribute the UPPER bound to the mean, so a noisy
    cloud recommends a LARGE k instead of aborting with converged_k=1
    (caught live: every Perturbed sweep row aborted before the fix)."""
    rng = np.random.default_rng(5)
    pts, _ = generate_shape("sphere", 4000, radius=1.0)
    noisy = pts + 0.02 * rng.standard_normal(pts.shape).astype(np.float32)
    cloud = from_numpy(noisy)
    k_rec, per_sample = explicit_quadratic_neighbor_study(
        cloud, tol=1e-9, sample_size=64, kmax=40)
    per = np.asarray(per_sample)
    assert (per < 0).any()          # some samples genuinely non-converged
    assert int(k_rec) >= 10         # the protocol proceeds at large k


def test_fused_cellwise_matches_staged_pipeline():
    """The single-jit fused path (curvature evaluated inside the cell
    loop, apply_cellwise) must agree with the staged pipeline on
    identical clouds — same kNN semantics, same fit chain."""
    from pct_tpu.neighbors.grid import estimate_cell_size
    from pct_tpu.pipeline.fused import fused_curvature

    pts, _ = generate_shape("torus", 3000, radius=1.0)
    cloud = from_numpy(pts)
    n = 3000
    staged = curvature_pipeline(cloud, k=16, tile=1024)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 16)
    fused = fused_curvature(cloud.points, cloud.num_points, cell, k=16)
    exact = np.asarray(fused.exact)[:n]
    assert exact.mean() > 0.999
    K_s = np.asarray(staged.curv.K)[:n]
    K_f = np.asarray(fused.curv.K)[:n]
    scale = np.abs(K_s).max()
    np.testing.assert_allclose(K_f[exact], K_s[exact], atol=2e-4 * scale)
    H_s = np.asarray(staged.curv.H)[:n]
    H_f = np.asarray(fused.curv.H)[:n]
    np.testing.assert_allclose(H_f[exact], H_s[exact],
                               atol=2e-4 * np.abs(H_s).max())
    dots = np.sum(np.asarray(fused.normals)[:n]
                  * np.asarray(staged.normals)[:n], axis=1)
    assert np.median(np.abs(dots)) > 0.9999
    # kth distance matches the staged pipeline's kNN
    np.testing.assert_allclose(np.asarray(fused.kth_dist)[:n][exact],
                               np.asarray(staged.neighbor_dists)[:n, -1][exact],
                               rtol=1e-5)


def test_fused_bucketed_matches_unbucketed():
    """Occupancy-bucketed cell loop must return identical results to the
    single-bucket path (same kNN, same math — only static padding
    differs), including on a pathological two-density cloud."""
    from pct_tpu.neighbors.cellknn import probe_grid_buckets
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
    from pct_tpu.pipeline.fused import fused_curvature

    rng = np.random.default_rng(7)
    torus, _ = generate_shape("torus", 2500, radius=1.0)
    # 180 < capacity_cap so the dense blob stays fully covered (a single
    # cell's population beyond capacity_cap degrades to exact=False)
    blob = rng.normal(size=(180, 3)).astype(np.float32) * 0.02 + 2.5
    pts = np.concatenate([torus, blob]).astype(np.float32)
    cloud = from_numpy(pts)
    n = len(pts)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 16)
    spec, mc = probe_grid_buckets(
        build_grid(cloud.points, cloud.num_points, cell), size_unit=32)
    assert len(spec) >= 2, f"density spread should produce buckets: {spec}"
    base = fused_curvature(cloud.points, cloud.num_points, cell, k=16,
                           max_cells=mc)
    buck = fused_curvature(cloud.points, cloud.num_points, cell, k=16,
                           max_cells=mc, bucket_spec=spec)
    eb = np.asarray(buck.exact)[:n]
    e0 = np.asarray(base.exact)[:n]
    assert eb.mean() > 0.99
    # bucketed exactness can only match or improve (tighter statics)
    assert (eb | ~e0).all()
    both = eb & e0
    np.testing.assert_array_equal(np.asarray(buck.curv.K)[:n][both],
                                  np.asarray(base.curv.K)[:n][both])
    np.testing.assert_array_equal(np.asarray(buck.normals)[:n][both],
                                  np.asarray(base.normals)[:n][both])
    np.testing.assert_array_equal(np.asarray(buck.kth_dist)[:n][both],
                                  np.asarray(base.kth_dist)[:n][both])


def test_fused_cellwise_implicit_method():
    from pct_tpu.neighbors.grid import estimate_cell_size
    from pct_tpu.pipeline.fused import fused_curvature

    pts, _ = generate_shape("sphere", 2000, radius=2.0)
    cloud = from_numpy(pts)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 40)
    r = fused_curvature(cloud.points, cloud.num_points, cell, k=40,
                        method="implicit")
    K = np.asarray(r.curv.K)[:2000]
    np.testing.assert_allclose(np.median(K), 0.25, rtol=0.05)


def test_fast_curvature_degenerate_inputs():
    """Tiny cloud (n < k) and all-identical points must stay finite
    (uncovered/unfound slots are inert; no NaNs leak)."""
    from pct_tpu.pipeline.fused import fast_curvature

    rng = np.random.default_rng(3)
    tiny = rng.standard_normal((5, 3)).astype(np.float32)
    r = fast_curvature(from_numpy(tiny), k=16)
    assert np.isfinite(np.asarray(r.curv.K)[:5]).all()
    assert np.isfinite(np.asarray(r.normals)[:5]).all()

    same = np.zeros((64, 3), np.float32) + 1.5
    r2 = fast_curvature(from_numpy(same), k=8)
    assert np.isfinite(np.asarray(r2.curv.K)[:64]).all()
    assert np.isfinite(np.asarray(r2.normals)[:64]).all()


def test_pipeline_padding_invariance():
    pts, _ = generate_shape("sphere", 900, radius=1.0)
    c1 = from_numpy(pts, capacity=1024)
    c2 = from_numpy(pts, capacity=2048)
    r1 = curvature_pipeline(c1, k=12, tile=512)
    r2 = curvature_pipeline(c2, k=12, tile=512)
    np.testing.assert_allclose(np.asarray(r1.curv.K)[:900],
                               np.asarray(r2.curv.K)[:900], rtol=1e-4)
