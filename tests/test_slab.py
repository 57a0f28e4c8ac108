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


def test_probed_halo_fully_certifies_at_scale():
    """VERDICT r3 item 4: the auto-probed halo (probe_slab_halo, derived
    from the sorted cell-id layout) must FULLY certify a real-size cloud
    on 8 devices — exact.mean() == 1.0, matching the single-chip
    certificate, not merely "sound"."""
    import jax.numpy as jnp

    from pct_tpu.distributed.slab import best_axis_order, probe_slab_halo
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
    from pct_tpu.pipeline.fused import fused_curvature

    n = 65_536
    pts, _ = generate_shape("torus", n, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=n)
    mesh = make_mesh(8)
    k = 12
    curv, normals, exact = slab_curvature_unsorted(mesh, cloud, k=k)
    e = np.asarray(exact)[:n]
    assert e.mean() == 1.0
    # single-chip oracle on the SAME permuted inputs (K is invariant
    # under the axis permutation; running single-chip permuted makes the
    # comparison same-arithmetic): every certified row agrees tightly
    order = best_axis_order(cloud.points, cloud.num_points)
    pts_p = cloud.points[:, jnp.array(order)]
    # same cell size the slab wrapper used (estimated on UNPERMUTED
    # points — estimate_cell_size is not fp-permutation-invariant)
    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    single = fused_curvature(pts_p, cloud.num_points, cell, k=k)
    assert np.asarray(single.exact)[:n].mean() == 1.0
    K_sl = np.asarray(curv.K)[:n]
    K_1 = np.asarray(single.curv.K)[:n]
    assert np.isclose(K_sl, K_1, rtol=1e-5, atol=1e-7).all()
    # analytic accuracy holds through the slab path
    Ka, _ = analytic_curvatures("torus", pts)
    strong = np.abs(Ka) > 0.5
    rel = np.abs(K_sl[strong] - Ka[strong]) / np.abs(Ka[strong])
    assert np.median(rel) < 0.06
    # and the probe is not trivially the whole slab
    grid = build_grid(pts_p, cloud.num_points, cell)
    h = probe_slab_halo(grid, 8)
    assert h < (cloud.points.shape[0] // 8) // 2
