import jax.numpy as jnp
import numpy as np
import pytest

from pct_tpu.mesh.boundary import (
    boundary_edges,
    detect_boundary_loops,
    fill_small_holes,
    is_planar,
)
from pct_tpu.mesh.downsample import voxel_downsample
from pct_tpu.mesh.energies import (
    mesh_energies,
    mesh_vertex_curvatures,
    triangle_areas,
    vertex_areas,
)
from pct_tpu.mesh.smooth import taubin_smooth


def icosphere(subdiv=3):
    """Unit icosphere via midpoint subdivision (no external deps)."""
    t = (1 + np.sqrt(5)) / 2
    v = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], dtype=np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], dtype=np.int64)
    for _ in range(subdiv):
        cache = {}
        verts = v.tolist()

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2
                m /= np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m.tolist())
            return cache[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.asarray(verts)
        f = np.asarray(nf, dtype=np.int64)
    return v.astype(np.float32), f.astype(np.int32)


@pytest.fixture(scope="module")
def sphere_mesh():
    return icosphere(3)


def test_triangle_and_vertex_areas(sphere_mesh):
    v, f = sphere_mesh
    area = np.asarray(triangle_areas(jnp.asarray(v), jnp.asarray(f)))
    assert np.isclose(area.sum(), 4 * np.pi, rtol=0.01)  # unit sphere
    va = np.asarray(vertex_areas(jnp.asarray(v), jnp.asarray(f)))
    np.testing.assert_allclose(va.sum(), area.sum(), rtol=1e-5)


def test_mesh_energies_sphere(sphere_mesh):
    # K=1, H=1 everywhere on the unit sphere -> bending=stretching=area=4π
    v, f = sphere_mesh
    ones = jnp.ones(v.shape[0])
    e = mesh_energies(jnp.asarray(v), jnp.asarray(f), ones, ones)
    assert np.isclose(float(e.total_area), 4 * np.pi, rtol=0.01)
    assert np.isclose(float(e.bending), 4 * np.pi, rtol=0.01)
    assert np.isclose(float(e.stretching), 4 * np.pi, rtol=0.01)


def test_mesh_energies_nan_tolerant(sphere_mesh):
    v, f = sphere_mesh
    K = np.ones(v.shape[0], np.float32)
    K[0] = np.nan  # nansum semantics (ref utils.py:757-760)
    e = mesh_energies(jnp.asarray(v), jnp.asarray(f), jnp.asarray(K),
                      jnp.ones(v.shape[0]))
    assert np.isfinite(float(e.stretching))


def test_mesh_vertex_curvatures_sphere(sphere_mesh):
    v, f = sphere_mesh
    K, H = mesh_vertex_curvatures(jnp.asarray(v), jnp.asarray(f))
    K, H = np.asarray(K), np.asarray(H)
    # unit sphere: K = 1, |H| = 1
    assert np.isclose(np.median(K), 1.0, rtol=0.05)
    assert np.isclose(np.median(H), 1.0, rtol=0.05)
    # Gauss-Bonnet: ∫K dA = 4π (angle defect is exact for closed meshes)
    va = np.asarray(vertex_areas(jnp.asarray(v), jnp.asarray(f)))
    assert np.isclose((K * va).sum(), 4 * np.pi, rtol=1e-4)


def test_taubin_smooth_shrinks_noise(sphere_mesh, rng):
    v, f = sphere_mesh
    noisy = v + rng.standard_normal(v.shape).astype(np.float32) * 0.01
    out = np.asarray(taubin_smooth(jnp.asarray(noisy), jnp.asarray(f),
                                   iterations=10))
    r_before = np.abs(np.linalg.norm(noisy, axis=1) - 1).mean()
    r_after = np.abs(np.linalg.norm(out, axis=1) - 1).mean()
    assert r_after < 0.7 * r_before      # noise reduced
    # Taubin (vs plain Laplacian) must not shrink the sphere much
    assert 0.97 < np.linalg.norm(out, axis=1).mean() < 1.05


def test_boundary_none_on_closed(sphere_mesh):
    v, f = sphere_mesh
    assert boundary_edges(f).size == 0
    assert detect_boundary_loops(f) == []


def test_boundary_loop_detected_and_filled(sphere_mesh):
    v, f = sphere_mesh
    # puncture the closed sphere: remove 3 adjacent faces -> one small loop
    f_holed = np.concatenate([f[:40], f[43:]])
    loops = detect_boundary_loops(f_holed)
    assert len(loops) == 1
    # a spherical cap is only approximately planar -> loose planar_tol
    filled, n_filled = fill_small_holes(v, f_holed, perimeter_factor=0.8,
                                        planar_tol=0.2)
    assert n_filled == 1
    assert filled.shape[0] > f_holed.shape[0]
    assert boundary_edges(filled).size == 0  # hole closed


def test_is_planar():
    rng = np.random.default_rng(0)
    flat = np.c_[rng.standard_normal((50, 2)), np.zeros(50)]
    assert is_planar(flat)
    assert not is_planar(rng.standard_normal((50, 3)))


def test_voxel_downsample_first():
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [0.15, 0.1, 0.1],
                    [2.1, 2.1, 2.1]], dtype=np.float32)
    out, kept = voxel_downsample(jnp.asarray(pts), jnp.asarray(4),
                                 jnp.float32(1.0), max_per_voxel=1)
    assert int(kept) == 2
    out = np.asarray(out)[:2]
    np.testing.assert_allclose(sorted(out[:, 0].tolist()), [0.1, 2.1])


def test_voxel_downsample_centroid():
    pts = np.array([[0.0, 0.0, 0.0], [0.2, 0.0, 0.0],
                    [5.0, 5.0, 5.0]], dtype=np.float32)
    out, kept = voxel_downsample(jnp.asarray(pts), jnp.asarray(3),
                                 jnp.float32(1.0), mode="centroid")
    assert int(kept) == 2
    out = np.asarray(out)[:2]
    got = sorted(out[:, 0].tolist())
    np.testing.assert_allclose(got, [0.1, 5.0], atol=1e-6)


def test_normals_orientation_sphere(rng):
    from pct_tpu.core import from_numpy
    from pct_tpu.mesh.normals import estimate_and_orient_normals
    from pct_tpu.shapes import generate_shape

    pts, _ = generate_shape("sphere", 2000, radius=1.0)
    cloud = from_numpy(pts)
    nrm = np.asarray(estimate_and_orient_normals(cloud, k=16))[:2000]
    # all normals consistently outward (or consistently inward): the dot
    # with the radial direction has a single sign
    d = np.sum(nrm * pts, axis=1)
    frac_pos = (d > 0).mean()
    assert frac_pos > 0.99 or frac_pos < 0.01


def test_normals_orientation_hierarchical_torus():
    """At 60k points the kNN-graph diameter (~250 hops) exceeds any
    affordable single-seed sweep count — the hierarchical coarse-seed
    path (mesh/normals.py) must still deliver globally consistent signs
    (the reference gets this from Open3D's MST, utils.py:80). Regression:
    the single-seed wavefront left 40% of a 300k torus mis-signed."""
    from pct_tpu.core import from_numpy
    from pct_tpu.mesh.normals import estimate_and_orient_normals
    from pct_tpu.shapes import generate_shape

    n = 60_000
    pts, _ = generate_shape("torus", n, radius=1.0)
    cloud = from_numpy(pts)
    nrm = np.asarray(estimate_and_orient_normals(cloud, k=16))[:n]
    # analytic tube normal: (p - c) with c the nearest center-circle point
    rho = np.linalg.norm(pts[:, :2], axis=1, keepdims=True)
    scale = pts[:, :2] / np.maximum(rho, 1e-9)
    c = np.concatenate([scale, np.zeros((n, 1), pts.dtype)], axis=1)
    # generate_shape scales the unit-ish torus by radius; recover the
    # center circle radius from the data (max rho = R + tube)
    R = 0.75 * rho.max()  # R : tube = 3 : 1 -> R = 0.75 (R + r_t)
    ana = pts - R * c
    agree = (np.sum(nrm * ana, axis=1) > 0).mean()
    assert agree > 0.999 or agree < 0.001


def test_fill_holes_by_size_nonplanar():
    """The final large-hole pass (ref utils.py:338-345 semantics) must
    close a NON-planar hole the small-hole (planarity-gated) pass skips:
    a spherical cap cut out of an icosphere."""
    from pct_tpu.mesh.boundary import (
        boundary_edges,
        fill_holes_by_size,
        fill_small_holes,
    )
    from pct_tpu.mesh.reconstruct import reconstruct_cloud
    from pct_tpu.shapes import generate_shape

    pts, _ = generate_shape("sphere", 3000, radius=1.0)
    faces = reconstruct_cloud(pts)
    # cut a deep cap (non-planar boundary curve once holes get large)
    keep = pts[:, 2] < 0.75
    old2new = -np.ones(len(pts), np.int64)
    old2new[keep] = np.arange(keep.sum())
    fkeep = keep[faces].all(axis=1)
    faces_cut = old2new[faces[fkeep]]
    pts_cut = pts[keep]
    assert len(boundary_edges(faces_cut)) > 10
    # the planarity-gated small-hole pass must NOT close a deep cap...
    f_small, _ = fill_small_holes(pts_cut, faces_cut)
    # ...the size-gated pass with a generous budget must
    f_big, n_big = fill_holes_by_size(pts_cut, faces_cut, hole_size=2.0)
    assert n_big >= 1
    assert len(boundary_edges(f_big)) < len(boundary_edges(faces_cut))


def test_order_loop_simple_cycle():
    from pct_tpu.mesh.boundary import order_loop

    # square hole: edges 0-1-2-3-0
    be = np.array([[0, 1], [1, 2], [2, 3], [0, 3]])
    cyc = order_loop(be, np.array([0, 1, 2, 3]))
    assert cyc is not None and len(cyc) == 4
    # walking order is a rotation/reflection of the cycle
    pos = {v: i for i, v in enumerate(cyc)}
    for a, b in be:
        assert (pos[a] - pos[b]) % 4 in (1, 3)


def test_mesh_pipeline_noisy_scanlike_fixture():
    """Perturbed (curvature-adaptive noise) sphere = a scan-like messy
    cloud: the full pipeline (BPA + jitter, hole passes incl. the final
    large-hole fill, Taubin, energies) must produce a near-closed mesh
    with sane energies — VERDICT r1 #8."""
    from pct_tpu.mesh.boundary import boundary_edges
    from pct_tpu.pipeline.mesh_pipeline import create_mesh_with_curvature
    from pct_tpu.shapes import generate_shape

    _, pts = generate_shape("sphere", 6000, radius=1.0,
                            perturbation_strength=0.01, seed=3)
    m = create_mesh_with_curvature(pts, k_neighbors=20)
    assert len(m.faces) > 1.7 * len(pts)          # near-closed: F ≈ 2V
    # residual open boundary is a tiny fraction of the edge count
    assert len(boundary_edges(m.faces)) < 0.01 * 3 * len(m.faces)
    e = m.energies
    assert np.isfinite(e.bending) and np.isfinite(e.total_area)
    assert abs(e.total_area - 4 * np.pi) / (4 * np.pi) < 0.06
    assert abs(e.bending - 4 * np.pi) / (4 * np.pi) < 0.15


def test_mesh_pipeline_dupin_cyclide():
    """Stress shape (dupin cyclide: genus-1, strongly varying feature
    size). Gauss-Bonnet: ∫K dA must be ~0 relative to ∫|K| dA."""
    import jax.numpy as jnp

    from pct_tpu.mesh.energies import triangle_areas
    from pct_tpu.pipeline.mesh_pipeline import create_mesh_with_curvature
    from pct_tpu.shapes import generate_shape

    pts, _ = generate_shape("dupin_cyclide", 8000, radius=1.0)
    m = create_mesh_with_curvature(pts, k_neighbors=20)
    # the cyclide's ~5-20x nearest-neighbor-distance spread is a known
    # BPA stressor: the spread-aware adaptive radii ladder
    # (bpa_radii_adaptive) lifts coverage to F/V ≈ 1.6 (fixed 8-rung
    # ladder: 1.50) but the mesh stays partial (closed would be 2) —
    # the pipeline must still complete with finite energies; the
    # Gauss-Bonnet residual is dominated by the missing high-curvature
    # horn area, so only a loose bound is meaningful
    assert len(m.faces) > 1.5 * len(pts)
    areas = np.asarray(triangle_areas(jnp.asarray(m.vertices),
                                      jnp.asarray(m.faces)))
    K_f = np.nanmean(m.K[m.faces], axis=1)
    abs_int = float(np.nansum(np.abs(K_f) * areas))
    assert np.isfinite(m.energies.bending)
    assert abs(float(m.energies.stretching)) < 0.25 * abs_int


def test_bpa_degenerate_inputs_terminate():
    """Hostile BPA inputs: exact duplicate points (zero-area seed
    candidates) and long collinear runs (degenerate circumcenters,
    ref utils.py:92-106 would delegate these to Open3D's guards).
    The native reconstruction (native/bpa.cpp) must terminate, index
    only valid vertices, and still mesh the clean part of the cloud."""
    from pct_tpu.mesh.reconstruct import ball_pivoting, cleanup_mesh
    from pct_tpu.shapes import generate_shape

    pts, _ = generate_shape("sphere", 2000, radius=1.0)
    pts = np.asarray(pts, np.float32)
    dup = pts[:50]                                   # exact duplicates
    line = np.stack([np.linspace(2.0, 3.0, 60),      # collinear, off-shape
                     np.zeros(60), np.zeros(60)], -1).astype(np.float32)
    cloud = np.concatenate([pts, dup, line])
    normals = cloud / np.maximum(
        np.linalg.norm(cloud, axis=1, keepdims=True), 1e-9)
    d = float(np.linalg.norm(pts[0] - pts[1:], axis=1).min())
    faces = cleanup_mesh(
        ball_pivoting(cloud, normals, [d, 2 * d, 4 * d]))
    assert faces.min() >= 0 and faces.max() < len(cloud)
    # the sphere part still reconstructs substantially
    assert (faces < len(pts)).all(axis=1).sum() > 0.8 * len(pts)


def test_face_padding_mask_is_identity(rng):
    """Pow2-bucketed face padding (mesh_pipeline.bucketed_faces) with
    face_mask must be bit-identical to the unpadded call for BOTH the
    energy integrals and Taubin smoothing — padding faces contribute
    exactly nothing."""
    import jax.numpy as jnp

    from pct_tpu.mesh.energies import mesh_energies
    from pct_tpu.mesh.smooth import taubin_smooth

    v = rng.standard_normal((60, 3)).astype(np.float32)
    f = rng.integers(0, 59, (37, 3)).astype(np.int32)
    K = rng.standard_normal(60).astype(np.float32)
    H = rng.standard_normal(60).astype(np.float32)
    cap = 64
    fp = np.zeros((cap, 3), np.int32)
    fp[:37] = f
    fm = jnp.asarray(np.arange(cap) < 37)
    e0 = mesh_energies(jnp.asarray(v), jnp.asarray(f), jnp.asarray(K),
                       jnp.asarray(H))
    e1 = mesh_energies(jnp.asarray(v), jnp.asarray(fp), jnp.asarray(K),
                       jnp.asarray(H), face_mask=fm)
    for a, b in zip(e0, e1):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)
    s0 = taubin_smooth(jnp.asarray(v), jnp.asarray(f), iterations=5)
    s1 = taubin_smooth(jnp.asarray(v), jnp.asarray(fp), iterations=5,
                       face_mask=fm)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_taubin_orphan_vertices_stay_put(rng):
    """Vertices referenced by no face must not move (Open3D semantics —
    previously they collapsed toward the origin)."""
    import jax.numpy as jnp

    from pct_tpu.mesh.smooth import taubin_smooth

    v = rng.standard_normal((10, 3)).astype(np.float32)
    f = np.array([[0, 1, 2], [1, 2, 3]], np.int32)   # vertices 4..9 orphan
    s = np.asarray(taubin_smooth(jnp.asarray(v), jnp.asarray(f),
                                 iterations=10))
    np.testing.assert_array_equal(s[4:], v[4:])


def test_coarse_spec_collides_across_clouds():
    """probe_grid_buckets(coarse=True) must return IDENTICAL statics for
    two clouds of the same family (different random seeds, ±face-count
    scale jitter) so the compiled fused program is reused — the tight DP
    spec is data-dependent and recompiles per cloud (~50 s/row in the
    mesh pipeline, measured)."""
    import jax.numpy as jnp  # noqa: F401

    from pct_tpu.core import from_numpy
    from pct_tpu.neighbors.cellknn import probe_grid_buckets
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
    from pct_tpu.shapes import generate_shape

    specs = []
    for seed in (0, 1):
        pts, _ = generate_shape("torus", 20_000, radius=1.0, seed=seed)
        cloud = from_numpy(pts)
        cell = estimate_cell_size(cloud.points, cloud.num_points, 20)
        grid = build_grid(cloud.points, cloud.num_points, cell)
        specs.append(probe_grid_buckets(grid, coarse=True))
    assert specs[0] == specs[1]
    assert len(specs[0][0]) == 1      # single coarse bucket


def test_normals_moments_hierarchical_path(monkeypatch):
    """The round-5 large-k normals route (moments raw normals +
    kv-voter select) must deliver globally consistent signs through the
    HIERARCHICAL branch too — reachable below 32k only by lowering the
    threshold (the 300k scans protocol runs this exact path)."""
    import pct_tpu.mesh.normals as nm
    from pct_tpu.core import from_numpy
    from pct_tpu.shapes import generate_shape

    monkeypatch.setattr(nm, "_HIER_THRESHOLD", 2000)
    n = 5000
    pts, _ = generate_shape("torus", n, radius=1.0)
    cloud = from_numpy(pts)
    nrm = np.asarray(nm.estimate_and_orient_normals(cloud, k=40))[:n]
    assert np.isfinite(nrm).all()
    rho = np.linalg.norm(pts[:, :2], axis=1, keepdims=True)
    scale = pts[:, :2] / np.maximum(rho, 1e-9)
    c = np.concatenate([scale, np.zeros((n, 1), pts.dtype)], axis=1)
    R = 0.75 * rho.max()
    ana = pts - R * c
    agree = (np.sum(nrm * ana, axis=1) > 0).mean()
    assert agree > 0.999 or agree < 0.001
