"""BASELINE.json stress configs: Möbius strip (orientation),
Dupin cyclide (non-uniform sampling), ε-ball queries on the egg carton."""

import jax.numpy as jnp
import numpy as np
import pytest

from pct_tpu.core import from_numpy
from pct_tpu.neighbors import ball_grid, build_grid, knn_cloud_grid
from pct_tpu.pipeline import curvature_pipeline, pointwise_curvature
from pct_tpu.shapes import generate_shape


def test_dupin_cyclide_knn_exact_despite_density():
    """The cyclide's pinch concentrates samples ~100x: the grid kNN must
    stay certified-exact via capacity probing + repair."""
    pts, _ = generate_shape("dupin_cyclide", 5000)
    cloud = from_numpy(pts)
    res, _ = knn_cloud_grid(cloud, k=12)
    assert np.asarray(res.exact)[:5000].all()
    r = curvature_pipeline(cloud, k=12)
    K = np.asarray(r.curv.K)[:5000]
    assert np.isfinite(K).all()


def test_mobius_orientation_seam():
    """Non-orientable surface: wavefront sign propagation must terminate
    and leave at most a thin seam (the reference's MST does the same)."""
    from pct_tpu.mesh.normals import estimate_and_orient_normals

    pts, _ = generate_shape("mobius", 4000)
    cloud = from_numpy(pts)
    nrm = np.asarray(estimate_and_orient_normals(cloud, k=12))[:4000]
    assert np.isfinite(nrm).all()
    # local consistency: neighbors mostly agree except along the seam
    res, _ = knn_cloud_grid(cloud, k=8)
    idx = np.asarray(res.indices)[:4000]
    dots = np.einsum("nd,nkd->nk", nrm, nrm[idx])
    agree = (dots > 0).mean()
    assert agree > 0.9     # seam affects only a narrow band


def test_mobius_curvature_finite():
    pts, _ = generate_shape("mobius", 4000)
    cloud = from_numpy(pts)
    r = curvature_pipeline(cloud, k=12)
    K = np.asarray(r.curv.K)[:4000]
    assert np.isfinite(K).all()
    # developable-ish narrow strip: |K| small compared to 1/width²
    assert np.median(np.abs(K)) < 5.0


def test_epsilon_ball_curvature_egg_carton():
    """BASELINE config 2: ε-ball neighborhoods on the egg carton, with the
    masked-fit path of pointwise_curvature."""
    pts, _ = generate_shape("egg_carton", 4000)
    cloud = from_numpy(pts)
    from pct_tpu.neighbors.bruteforce import mean_nn_distance

    dbar = float(mean_nn_distance(cloud.points, cloud.num_points))
    radius = 4.0 * dbar
    grid = build_grid(cloud.points, cloud.num_points, jnp.float32(radius))
    res = ball_grid(grid, cloud.points, jnp.float32(radius),
                    max_neighbors=64, capacity=192, exclude_self=True)
    counts = np.asarray(res.valid)[:4000].sum(axis=1)
    assert counts.min() >= 6          # interior + boundary all covered
    # coverage must be certified, not assumed (capacity covers the cells)
    assert np.asarray(res.exact)[:4000].mean() > 0.95
    assert counts.max() < 64          # no saturated (truncated) lists
    curv, normals, _ = pointwise_curvature(
        cloud.points, res.indices, method="explicit",
        neighbor_mask=res.valid, tile=1024)
    K = np.asarray(curv.K)[:4000]
    assert np.isfinite(K).all()
    # egg carton: K in [-K0, K0] with K0 = (0.1π²)² ≈ 0.97 (+fit noise)
    inner = np.abs(pts[:, 0]) < 0.8
    assert np.abs(K[inner]).max() < 2.0

def test_cyclide_orientation_voter_truncation():
    """High-genus regression gate for the orientation VOTER truncation
    (ADVICE r4): _normals_device votes over only the 12 nearest of the
    k=50 graph — on thin/high-genus geometry (the cyclide's pinch packs
    samples ~100x denser) a too-small voter graph could disconnect and
    leave whole components flipped. The cyclide is orientable, so signs
    must be GLOBALLY consistent: neighbor agreement ~1.0, not merely
    seam-tolerant like the möbius gate."""
    from pct_tpu.mesh.normals import estimate_and_orient_normals

    n = 6000
    pts, _ = generate_shape("dupin_cyclide", n)
    cloud = from_numpy(pts)
    nrm = np.asarray(estimate_and_orient_normals(cloud, k=50))[:n]
    assert np.isfinite(nrm).all()
    res, _ = knn_cloud_grid(cloud, k=8)
    idx = np.asarray(res.indices)[:n]
    dots = np.einsum("nd,nkd->nk", nrm, nrm[idx])
    assert (dots > 0).mean() > 0.99
