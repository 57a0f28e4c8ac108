"""Distributed sample-sort grid build (distributed/sort.py).

The contract under test: ``build_grid_distributed`` produces BIT-IDENTICAL
arrays to the replicated ``build_grid`` (same stable tie order, same
padding layout), and capacity overflows are certified via ``ok`` instead
of silently dropping rows.
"""

import numpy as np
import pytest

from pct_tpu.core import from_numpy
from pct_tpu.distributed.sharding import make_mesh
from pct_tpu.distributed.sort import build_grid_distributed
from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
from pct_tpu.shapes import generate_shape


def _assert_grids_equal(g_ref, g_dist):
    for name in ("sorted_ids", "order", "sorted_points", "origin",
                 "cell_size", "dims"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_dist, name))
        np.testing.assert_array_equal(a, b, err_msg=name)


@pytest.mark.parametrize("devices", [2, 8])
def test_distributed_sort_bit_identical(rng, devices):
    pts, _ = generate_shape("torus", 4096, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=4096)
    mesh = make_mesh(devices)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 12)
    g_ref = build_grid(cloud.points, cloud.num_points, cell)
    g_dist, ok = build_grid_distributed(mesh, cloud.points,
                                        cloud.num_points, cell)
    assert bool(ok)
    _assert_grids_equal(g_ref, g_dist)


def test_distributed_sort_padded_rows(rng):
    """Padding rows (num_points < capacity) reproduce build_grid's
    layout exactly: PAD_ID ids, zero coords, order = original pad row."""
    pts = rng.normal(size=(3000, 3)).astype(np.float32)
    cloud = from_numpy(pts, pad_multiple=4096)
    assert cloud.points.shape[0] == 4096
    mesh = make_mesh(8)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 8)
    g_ref = build_grid(cloud.points, cloud.num_points, cell)
    g_dist, ok = build_grid_distributed(mesh, cloud.points,
                                        cloud.num_points, cell)
    assert bool(ok)
    _assert_grids_equal(g_ref, g_dist)


def test_distributed_sort_skewed_density(rng):
    """A dense cluster plus sparse background stresses the sampled
    splitters; the rebalance pass must still produce the exact order."""
    dense = (rng.normal(size=(3072, 3)) * 0.05).astype(np.float32)
    sparse = rng.uniform(-3, 3, size=(1024, 3)).astype(np.float32)
    pts = np.concatenate([dense, sparse]).astype(np.float32)
    cloud = from_numpy(pts, pad_multiple=4096)
    mesh = make_mesh(8)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 8)
    g_ref = build_grid(cloud.points, cloud.num_points, cell)
    g_dist, ok = build_grid_distributed(mesh, cloud.points,
                                        cloud.num_points, cell)
    # even heavily skewed, the default capacities should cover this
    assert bool(ok)
    _assert_grids_equal(g_ref, g_dist)


def test_distributed_sort_giant_tie_group():
    """All points in ONE cell: the two-key (id, original row) splitters
    must still balance the exchange and produce the exact stable order
    (a single-key sample sort would land the whole cloud on one shard)."""
    pts = np.zeros((4096, 3), np.float32)
    cloud = from_numpy(pts, pad_multiple=4096)
    mesh = make_mesh(8)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 8)
    g_ref = build_grid(cloud.points, cloud.num_points, cell)
    g_dist, ok = build_grid_distributed(mesh, cloud.points,
                                        cloud.num_points, cell)
    assert bool(ok)
    _assert_grids_equal(g_ref, g_dist)


def test_distributed_sort_overflow_is_certified():
    """Starved static capacities MUST flag ok=False — rows are dropped
    detectably, never silently."""
    pts, _ = generate_shape("sphere", 4096, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=4096)
    mesh = make_mesh(8)
    cell = estimate_cell_size(cloud.points, cloud.num_points, 8)
    _, ok = build_grid_distributed(mesh, cloud.points, cloud.num_points,
                                   cell, send_cap=8)
    assert not bool(ok)


def test_slab_distributed_sort_matches_replicated():
    """slab_curvature(distributed_sort=True) is bit-identical to the
    replicated-sort slab path (the sort layout is identical, so the same
    tiles compute the same math)."""
    from pct_tpu.distributed.slab import slab_curvature_unsorted

    pts, _ = generate_shape("torus", 4096, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=4096)
    mesh = make_mesh(4)
    curv_r, nrm_r, ex_r = slab_curvature_unsorted(mesh, cloud, k=12,
                                                  halo=512)
    curv_d, nrm_d, ex_d = slab_curvature_unsorted(mesh, cloud, k=12,
                                                  halo=512,
                                                  distributed_sort=True)
    np.testing.assert_array_equal(np.asarray(ex_r), np.asarray(ex_d))
    np.testing.assert_array_equal(np.asarray(curv_r.K),
                                  np.asarray(curv_d.K))
    np.testing.assert_array_equal(np.asarray(nrm_r), np.asarray(nrm_d))
    assert np.asarray(ex_d)[:4096].mean() > 0.5
