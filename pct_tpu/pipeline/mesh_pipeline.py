"""Mesh pipeline orchestrator: reconstruct → clean → fill → smooth →
curvature → energies.

Parity with ref utils.py:20-377 ``create_mesh_with_curvature`` +
utils.py:702-765 ``load_mesh_compute_energies``, minus the reference's
file-system bus (temp .txt handoff, utils.py:372-377): everything stays
in arrays. Stages:

1. normals: device covariance + wavefront orientation (utils.py:74-80)
2. BPA radii from mean 1-NN spacing (utils.py:441-470)
3. first-party C++ ball pivoting (utils.py:94)
4. cleanup: degenerate/duplicate faces (utils.py:104-106)
5. boundary loops ×2 + small-hole Delaunay fill (utils.py:151-288)
6. Taubin smooth ×10 (utils.py:319-322)
7. vertex curvatures: pointwise quadric fit on the vertices (the
   reference refits a PointCloud on the mesh vertices, utils.py:481-501)
8. face-averaged energy integrals, O(T) (utils.py:702-765)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from pct_tpu.core.cloud import from_numpy
from pct_tpu.mesh.boundary import fill_small_holes
from pct_tpu.mesh.energies import MeshEnergies, mesh_energies
from pct_tpu.mesh.reconstruct import bpa_radii, ball_pivoting, cleanup_mesh
from pct_tpu.mesh.smooth import taubin_smooth
from pct_tpu.pipeline.fused import fast_curvature


@dataclasses.dataclass
class MeshResult:
    vertices: np.ndarray
    faces: np.ndarray
    normals: np.ndarray
    K: np.ndarray
    H: np.ndarray
    energies: MeshEnergies
    n_holes_filled: int
    timings: dict = dataclasses.field(default_factory=dict)
    """Per-stage wall seconds (normals/bpa/holes/smooth/curvature/
    energies) — the observability analogue of the reference's cProfile
    wrapper (ref main_scans.py:70-73)."""


def create_mesh_with_curvature(
    points: np.ndarray,
    k_neighbors: int = 20,
    num_radii: Optional[int] = None,
    smooth_iterations: int = 10,
    fill_holes: bool = True,
    save_mesh_path: Optional[str] = None,
) -> MeshResult:
    """``num_radii=None`` (default) uses the spread-aware adaptive
    ladder (``bpa_radii_adaptive`` — up to the reference's 25 rungs on
    high-spacing-spread clouds, utils.py:441-470); pass an int for the
    fixed geometric ladder."""
    import time

    points = np.asarray(points, dtype=np.float32)
    cloud = from_numpy(points)
    n = int(cloud.num_points)
    timings: dict = {}
    _t = time.perf_counter()

    def lap(stage):
        nonlocal _t
        now = time.perf_counter()
        timings[stage] = round(now - _t, 3)
        _t = now

    from pct_tpu.mesh.normals import estimate_and_orient_normals
    from pct_tpu.mesh.reconstruct import bpa_radii_adaptive
    from pct_tpu.neighbors.bruteforce import sampled_nn_distances

    normals = np.asarray(estimate_and_orient_normals(
        cloud, k=min(50, max(4, n - 1))))[:n]
    lap("normals")
    nn_d = np.asarray(sampled_nn_distances(cloud.points, cloud.num_points))
    dbar = float(np.nanmean(nn_d))
    radii = (bpa_radii_adaptive(nn_d) if num_radii is None
             else bpa_radii(dbar, num_radii))
    faces = cleanup_mesh(ball_pivoting(points, normals, radii,
                                       degeneracy_jitter=0.01,
                                       mean_spacing=dbar))
    lap("bpa")

    filled = 0
    if fill_holes and faces.size:
        # the reference runs its hole pass twice back-to-back (utils.py:151,236)
        for _ in range(2):
            faces, nf = fill_small_holes(points, faces)
            filled += nf
        faces = cleanup_mesh(faces.astype(np.int32))
        lap("holes_small")

    def bucketed_faces(f):
        # pow2-bucketed static face count: every mesh of a size class
        # shares ONE compiled taubin/energies program. Without this each
        # row's unique face count forced a fresh ~2-min XLA compile
        # (measured 145 s t_energies on rows whose warm cost is 2.2 s).
        t = f.shape[0]
        cap = max(128, 1 << (t - 1).bit_length())
        fp = np.zeros((cap, 3), np.int32)
        fp[:t] = f
        return jnp.asarray(fp), jnp.asarray(np.arange(cap) < t)

    verts = points
    if smooth_iterations > 0 and faces.size:
        fpad, fmask = bucketed_faces(faces)
        verts = np.asarray(taubin_smooth(jnp.asarray(points), fpad,
                                         iterations=smooth_iterations,
                                         face_mask=fmask))
        lap("smooth")

    if fill_holes and faces.size:
        # final large-hole pass after smoothing (ref utils.py:338-345:
        # pyvista fill_holes(hole_size=bbox_avg/10)) — non-planar loops
        # included, min-area triangulation
        from pct_tpu.mesh.boundary import fill_holes_by_size

        bbox = points.max(0) - points.min(0)
        faces, nf = fill_holes_by_size(verts, faces,
                                       hole_size=float(bbox.mean()) / 10.0)
        filled += nf
        faces = cleanup_mesh(faces.astype(np.int32))
        lap("holes_large")

    # curvature on the (smoothed) mesh vertices — reference semantics:
    # a fresh PointCloud over the mesh vertices (utils.py:481-501, k=100
    # fits on mesh vertices at :484). fast_curvature routes large k
    # through the moments engine — the scans-class k=100 protocol runs
    # the fast path, not the staged pipeline.
    vcloud = from_numpy(verts)
    r = fast_curvature(vcloud, k=k_neighbors, coarse_spec=True)
    K = np.asarray(r.curv.K)[:n]
    H = np.asarray(r.curv.H)[:n]
    lap("curvature")

    if faces.size:
        fpad, fmask = bucketed_faces(faces)
        e = mesh_energies(jnp.asarray(verts), fpad, jnp.asarray(K),
                          jnp.asarray(H), face_mask=fmask)
    else:
        e = MeshEnergies(jnp.float32(np.nan), jnp.float32(np.nan),
                         jnp.float32(0.0))
    energies = MeshEnergies(*(float(x) for x in e))
    lap("energies")

    if save_mesh_path:
        scalars = {"gaussian_curvature": K, "mean_curvature": H}
        if save_mesh_path.lower().endswith(".vtk"):
            # mesh_snaps/*.vtk artifact parity (ref utils.py:356-366)
            from pct_tpu.io.vtk import write_vtk

            write_vtk(save_mesh_path, verts, faces, scalars)
        else:
            from pct_tpu.io.ply import write_ply

            write_ply(save_mesh_path, verts, normals, faces,
                      vertex_props=scalars)
    return MeshResult(verts, faces, normals, K, H, energies, filled,
                      timings)
