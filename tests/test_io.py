import numpy as np
import pytest

from pct_tpu.io import (
    convert_asc_to_ply,
    read_ply,
    read_txt,
    strip_normals,
    voxel_downsample_first,
    write_ply,
    write_txt,
)


@pytest.fixture
def pts(rng):
    return rng.standard_normal((100, 3)).astype(np.float32)


def test_txt_roundtrip(tmp_path, pts):
    p = tmp_path / "c.txt"
    write_txt(str(p), pts)
    out, nrm = read_txt(str(p), translate_xy_max=False)
    np.testing.assert_allclose(out, pts, rtol=1e-5)
    assert nrm is None


def test_txt_normals_and_translate(tmp_path, pts, rng):
    nrm = rng.standard_normal((100, 3)).astype(np.float32)
    p = tmp_path / "c.txt"
    write_txt(str(p), pts, nrm)
    out, n2 = read_txt(str(p))  # default translate matches reference quirk
    assert np.isclose(out[:, 0].max(), 0.0, atol=1e-5)
    assert np.isclose(out[:, 1].max(), 0.0, atol=1e-5)
    np.testing.assert_allclose(n2, nrm, rtol=1e-5)


@pytest.mark.parametrize("binary", [False, True])
def test_ply_roundtrip(tmp_path, pts, rng, binary):
    nrm = rng.standard_normal((100, 3)).astype(np.float32)
    K = rng.standard_normal(100).astype(np.float32)
    faces = rng.integers(0, 100, size=(40, 3)).astype(np.int32)
    p = tmp_path / "c.ply"
    write_ply(str(p), pts, nrm, faces, {"gaussian_curvature": K}, binary=binary)
    d = read_ply(str(p))
    np.testing.assert_allclose(d.points, pts, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d.normals, nrm, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(d.faces, faces)
    np.testing.assert_allclose(d.vertex_props["gaussian_curvature"], K,
                               rtol=1e-5, atol=1e-6)


def test_strip_normals(tmp_path, pts, rng):
    nrm = rng.standard_normal((100, 3)).astype(np.float32)
    a, b = tmp_path / "a.ply", tmp_path / "b.ply"
    write_ply(str(a), pts, nrm)
    strip_normals(str(a), str(b))
    d = read_ply(str(b))
    assert d.normals is None
    np.testing.assert_allclose(d.points, pts, rtol=1e-5, atol=1e-6)


def test_voxel_downsample_first_keeps_first():
    pts = np.array([[0.01, 0.01, 0.01],
                    [0.02, 0.02, 0.02],   # same voxel as row 0
                    [1.5, 1.5, 1.5]], dtype=np.float32)
    out = voxel_downsample_first(pts, 1.0)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out[0], pts[0])


def test_asc_convert(tmp_path, rng):
    data = rng.standard_normal((50, 6)).astype(np.float32)
    asc = tmp_path / "s.asc"
    np.savetxt(asc, data)
    n = convert_asc_to_ply(str(asc), str(tmp_path / "s.ply"), voxel_size=None)
    assert n == 50
    d = read_ply(str(tmp_path / "s.ply"))
    np.testing.assert_allclose(d.points, data[:, :3], rtol=1e-5, atol=1e-6)


def test_vtk_roundtrip(tmp_path, pts, rng):
    from pct_tpu.io.vtk import read_vtk, write_vtk

    faces = rng.integers(0, 100, size=(30, 3)).astype(np.int32)
    K = rng.standard_normal(100).astype(np.float32)
    p = tmp_path / "m.vtk"
    write_vtk(str(p), pts, faces, {"gaussian_curvature": K})
    pts2, faces2, scalars = read_vtk(str(p))
    np.testing.assert_allclose(pts2, pts, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(faces2, faces)
    np.testing.assert_allclose(scalars["gaussian_curvature"], K,
                               rtol=1e-5, atol=1e-6)
