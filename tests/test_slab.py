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
