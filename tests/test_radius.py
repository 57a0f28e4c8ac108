"""Radius-envelope validation (VERDICT r3 item 1).

The reference sweeps desired_scale r ∈ {0.1, 10, 1000}
(ref main_shape_validation.py:61-63); every other test in this suite
uses r=1.0. These gates prove the f32 chain is SCALE-INVARIANT across
the full envelope: the kNN certificate still certifies 1.0 and the
curvature errors match the r=1.0 quality (every fit preconditions its
neighborhood to unit scale, so r only moves the grid geometry — no
absolute epsilon anywhere on the path bites between 0.1 and 1000).
"""

import numpy as np
import pytest

from pct_tpu.core import from_numpy
from pct_tpu.pipeline.fused import fast_curvature
from pct_tpu.shapes import analytic_curvatures, generate_shape

# r=1.0 quality levels measured on the same 8k clouds (see
# /tmp probes recorded in CLAUDE.md round-4 notes): sphere med 5.2e-3,
# torus med 8.4e-3 / p99 2.6e-2 — gates set ~1.5x above
GATES = {
    "sphere": dict(med=8e-3, p99=1e-2),
    "torus": dict(med=1.3e-2, p99=4e-2),
}


@pytest.mark.parametrize("radius", [0.1, 1000.0])
@pytest.mark.parametrize("shape", ["sphere", "torus"])
def test_curvature_core_scale_invariant(shape, radius):
    pts, _ = generate_shape(shape, 8000, radius=radius)
    cloud = from_numpy(pts)
    n = int(cloud.num_points)
    res = fast_curvature(cloud, k=20)
    exact = np.asarray(res.exact)[:n]
    assert exact.mean() == 1.0
    K = np.asarray(res.curv.K)[:n]
    assert np.isnan(K).mean() == 0.0
    Ka, Ha = analytic_curvatures(shape, pts, radius=radius)
    scale = np.abs(Ka).max()
    relK = np.abs(K - Ka) / scale
    g = GATES[shape]
    assert np.median(relK) < g["med"]
    assert np.quantile(relK, 0.99) < g["p99"]
    # kth distance scales with r (sanity that outputs are in the
    # caller's units, not a normalized space)
    kth = np.asarray(res.kth_dist)[:n]
    assert np.median(kth) > 0.005 * radius


@pytest.mark.parametrize("radius", [0.1, 1000.0])
def test_neighbor_sets_identical_across_scale(radius):
    """The grid kNN must return the SAME neighbor sets at any uniform
    scale — scaling is monotone in distance, so any divergence beyond
    f32-rounding tie flips is an absolute-epsilon bug. (The lattice
    torus has EXACT distance ties that rescaling re-rounds arbitrarily
    — measured 7% of rows — so this uses a tie-free perturbed cloud.)
    """
    from pct_tpu.neighbors.knn import knn_cloud_grid

    pts, _ = generate_shape("torus", 4000, radius=1.0)
    rng = np.random.default_rng(3)
    pts = pts + 1e-3 * rng.standard_normal(pts.shape).astype(np.float32)
    res1, _ = knn_cloud_grid(from_numpy(pts), 12)
    res2, _ = knn_cloud_grid(from_numpy(pts * np.float32(radius)), 12)
    i1 = np.sort(np.asarray(res1.indices), axis=1)
    i2 = np.sort(np.asarray(res2.indices), axis=1)
    same = (i1 == i2).all(axis=1)
    assert same.mean() > 0.999
    # kth distances scale exactly with r (to f32 rounding)
    d1 = np.asarray(res1.dists)[:, -1]
    d2 = np.asarray(res2.dists)[:, -1]
    np.testing.assert_allclose(d2, d1 * radius, rtol=1e-5)


@pytest.mark.parametrize("radius", [0.1, 1000.0])
def test_mesh_protocol_holds_at_scale_extremes(radius):
    """Full reference protocol (BPA -> holes -> vertex curvature ->
    face-integrated energies) at the radius extremes: area and bending
    errors at the r=1.0 quality level. Bending ∫H²dA and stretching
    ∫K dA are scale-invariant; area scales as r² — all three must land
    regardless of the f32 coordinate magnitude."""
    from pct_tpu.shapes import analytic_area, analytic_energies
    from pct_tpu.validate.harness import validate_cloud

    pts, _ = generate_shape("sphere", 8000, radius=radius)
    res = validate_cloud(pts, shape="sphere", radius=radius, k_neighbors=20,
                         auto_k=False, use_mesh=True, smooth_iterations=0)
    assert res.aborted == ""
    area_t = analytic_area("sphere", radius)
    bend_t, stretch_t = analytic_energies("sphere", radius)
    assert abs(res.total_area - area_t) / area_t < 0.01
    assert abs(res.bending_energy - bend_t) / bend_t < 0.05
    assert abs(res.stretching_energy - stretch_t) / stretch_t < 0.05
