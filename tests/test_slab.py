"""Slab-resident distributed kNN+curvature (halo exchange over ppermute)."""

import numpy as np
import pytest

from pct_tpu.core import from_numpy
from pct_tpu.distributed.sharding import make_mesh
from pct_tpu.distributed.slab import slab_curvature_unsorted
from pct_tpu.shapes import analytic_curvatures, generate_shape


def test_slab_wide_halo_exact_and_accurate():
    pts, _ = generate_shape("torus", 4096, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=4096)
    mesh = make_mesh(4)
    # generous halo (must stay < slab size): near-full coverage
    curv, normals, exact = slab_curvature_unsorted(mesh, cloud, k=12,
                                                   halo=1000)
    e = np.asarray(exact)[:4096]
    K = np.asarray(curv.K)[:4096]
    Ka, _ = analytic_curvatures("torus", pts)
    # the id-range certificate is conservative at slab ends — sound
    # (never certifies a wrong result) but strict
    assert e.mean() > 0.9
    strong = np.abs(Ka) > 0.5
    ok = e & strong
    rel = np.abs(K[ok] - Ka[ok]) / np.abs(Ka[ok])
    assert np.median(rel) < 0.06


def test_slab_certificate_catches_thin_halo():
    """With a halo too thin for the neighbor radius, results MUST be
    flagged inexact rather than silently wrong."""
    pts, _ = generate_shape("sphere", 4096, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=4096)
    mesh = make_mesh(8)
    curv, normals, exact = slab_curvature_unsorted(mesh, cloud, k=12, halo=16)
    e = np.asarray(exact)[:4096]
    K = np.asarray(curv.K)[:4096]
    Ka, _ = analytic_curvatures("sphere", pts)
    assert e.mean() < 1.0  # thin halo cannot fully certify
    # certified points must still be CORRECT
    rel = np.abs(K[e] - Ka[e]) / np.abs(Ka[e])
    if e.any():
        assert np.median(rel) < 0.06


def test_slab_certified_rows_match_single_chip_exactly():
    """The slab path now runs the same fused cell-centric tile body as
    the single-chip flagship on its local grid; local sorted order
    preserves the global candidate order within every cell, so certified
    rows must agree with the single-chip fused path exactly (rtol guards
    only XLA fusion-level fp noise between the two programs)."""
    from pct_tpu.neighbors.grid import estimate_cell_size
    from pct_tpu.pipeline.fused import fused_curvature

    pts, _ = generate_shape("torus", 4096, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=4096)
    mesh = make_mesh(4)
    curv, normals, exact = slab_curvature_unsorted(mesh, cloud, k=12,
                                                   halo=1000)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 12)
    single = fused_curvature(cloud.points, cloud.num_points, cell, k=12)
    e = np.asarray(exact)[:4096] & np.asarray(single.exact)[:4096]
    assert e.mean() > 0.9
    K_sl = np.asarray(curv.K)[:4096][e]
    K_1 = np.asarray(single.curv.K)[:4096][e]
    assert np.isclose(K_sl, K_1, rtol=1e-5, atol=1e-7).all()
