"""Reference-compatible façade.

Drop-in surface for users of the reference toolbox: the class and
function names of ``pointCloudToolbox.PointCloud`` (ref
pointCloudToolbox.py:24) and of ``utils`` (ref utils.py) mapped onto the
TPU-native kernels. Semantics follow the reference (query-point
centering, k+1-drop-self kNN, sign-fix, etc.); computation is batched
and device-resident instead of per-point Python loops.

Intentional divergences (documented, all improvements):
- ``downsample=True`` works (the reference calls a fully commented-out
  method and crashes, ref :59-60 / :159-193)
- ``plant_kdtree`` builds the grid index; queries are exact (certified)
- energies are O(T) (the reference's are O(T²), ref utils.py:757-760)
- SLSQP quadric fits are closed-form smallest-eigenvector solves
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class PointCloud:
    """ref pointCloudToolbox.py:24-47 ctor surface."""

    def __init__(self, file_path: Optional[str] = None, points=None,
                 normals=None, downsample: bool = False,
                 voxel_size: float = 0.01, k_neighbors: int = 20,
                 output_path: str = "./output/",
                 max_points_per_voxel: int = 1):
        from pct_tpu.core import from_numpy
        from pct_tpu.io import load_points

        if file_path is not None:
            points, normals = load_points(file_path)
        if points is None:
            raise ValueError("need file_path or points")
        points = np.asarray(points, dtype=np.float32).reshape(-1, 3)
        if downsample:
            # the reference crashes here (commented-out method still
            # invoked); we do the voxel downsample it intended
            import jax.numpy as jnp

            from pct_tpu.mesh.downsample import voxel_downsample

            c0 = from_numpy(points)
            out, kept = voxel_downsample(c0.points, c0.num_points,
                                         jnp.float32(voxel_size),
                                         max_per_voxel=max_points_per_voxel)
            points = np.asarray(out)[: int(kept)]
            normals = None
        self.k_neighbors = k_neighbors
        self.output_path = output_path
        self.cloud = from_numpy(points, normals)
        self.points = points
        self.normals = (np.zeros((0, 3), np.float32) if normals is None
                        else np.asarray(normals))
        self.num_points = points.shape[0]
        # whole-cloud norms (ref :43-47). The reference calls
        # np.linalg.norm on the (N,3) MATRIX, so these are matrix norms:
        # l1 = max column abs-sum, l2 = spectral (largest singular
        # value), linf = max row abs-sum.
        p64 = points.astype(np.float64)
        if p64.size:
            self.l1_norm = float(np.linalg.norm(p64, 1))
            self.l2_norm = float(np.linalg.norm(p64, 2))
            self.linf_norm = float(np.linalg.norm(p64, np.inf))
        else:
            self.l1_norm = self.l2_norm = self.linf_norm = 0.0
        self._neighbors = None
        self.dists = None
        self.neighbor_indices = None
        self.quadratic_coefficients = None
        self.quadric_coefficients = None
        self.K_quadratic = None
        self.H_quadratic = None
        self.K_H_sq_quadratic = None
        self.K_quadric = None
        self.H_quadric = None

    # ---- kNN index (ref :69-85) ----
    def plant_kdtree(self, k_neighbors: Optional[int] = None):
        from pct_tpu.neighbors import knn_cloud_grid

        k = k_neighbors or self.k_neighbors
        self.k_neighbors = k
        res, grid = knn_cloud_grid(self.cloud, k)
        n = self.num_points
        self.neighbor_indices = np.asarray(res.indices)[:n]
        self.dists = np.asarray(res.dists)[:n]
        self._grid = grid
        return self.neighbor_indices, self.dists

    def _ensure_neighbors(self):
        if self.neighbor_indices is None:
            self.plant_kdtree()

    # ---- explicit quadratic path (ref :635-674) ----
    def fit_explicit_quadratic_surfaces_to_neighborhoods(self):
        import jax.numpy as jnp

        from pct_tpu.pipeline.curvature_pipeline import pointwise_curvature

        self._ensure_neighbors()
        curv, normals, coeffs = pointwise_curvature(
            self.cloud.points, jnp.asarray(self.neighbor_indices),
            method="explicit")
        self.quadratic_coefficients = np.asarray(coeffs)
        self._explicit_curv = curv
        self.estimated_normals = np.asarray(normals)
        return self.quadratic_coefficients

    def calculate_curvatures_of_explicit_quadratic_surfaces_for_all_points(self):
        if self.quadratic_coefficients is None:
            self.fit_explicit_quadratic_surfaces_to_neighborhoods()
        c = self._explicit_curv
        self.K_quadratic = np.asarray(c.K)
        self.H_quadratic = np.asarray(c.H)
        self.K_H_sq_quadratic = np.asarray(c.H_sq)
        return self.K_quadratic, self.H_quadratic

    def compute_pointwise_explicit_quadratic_curvature(self):
        self.calculate_curvatures_of_explicit_quadratic_surfaces_for_all_points()
        return self.K_quadratic, self.H_quadratic

    # ---- implicit quadric path (ref :617-689) ----
    def fit_implicit_quadric_surfaces_all_points(self, mode: str = "exact"):
        import jax.numpy as jnp

        from pct_tpu.pipeline.curvature_pipeline import pointwise_curvature

        self._ensure_neighbors()
        curv, _, coeffs = pointwise_curvature(
            self.cloud.points, jnp.asarray(self.neighbor_indices),
            method="implicit", implicit_mode=mode)
        self.quadric_coefficients = np.asarray(coeffs)
        self._implicit_curv = curv
        return self.quadric_coefficients

    def calculate_curvatures_of_implicit_quadric_surfaces_for_all_points(
            self, mode: str = "exact"):
        if self.quadric_coefficients is None:
            self.fit_implicit_quadric_surfaces_all_points(mode)
        c = self._implicit_curv
        self.K_quadric = np.asarray(c.K)
        self.H_quadric = np.asarray(c.H)
        return self.K_quadric, self.H_quadric

    def compute_pointwise_implicit_quadric_curvature(self, mode="exact"):
        self.calculate_curvatures_of_implicit_quadric_surfaces_for_all_points(mode)
        return self.K_quadric, self.H_quadric

    # ---- PCA proxy (ref :901-945) ----
    def principal_curvatures_via_principal_component_analysis(self, k: int):
        import jax.numpy as jnp

        from pct_tpu.curvature.pca import pca_principal_curvatures
        from pct_tpu.neighbors import knn_cloud_grid

        res, _ = knn_cloud_grid(self.cloud, k)
        n = self.num_points
        idx = jnp.asarray(np.asarray(res.indices)[:n])
        r = pca_principal_curvatures(self.cloud.points, idx)
        self.pca_k1 = np.asarray(r.k1)
        self.pca_k2 = np.asarray(r.k2)
        self.pca_K = np.asarray(r.K)
        self.pca_H = np.asarray(r.H)
        self.pca_dir1 = np.asarray(r.dir1)
        self.pca_dir2 = np.asarray(r.dir2)
        return self.pca_k1, self.pca_k2

    # ---- neighbor study (ref :732-800) ----
    def explicit_quadratic_neighbor_study(self, tolerance: float = 1e-7,
                                          sample_size: int = 500):
        from pct_tpu.pipeline.neighbor_study import (
            explicit_quadratic_neighbor_study,
        )

        k_rec, _ = explicit_quadratic_neighbor_study(
            self.cloud, tol=tolerance, sample_size=sample_size)
        return int(k_rec)

    # ---- energies (ref :649-655 static form) ----
    @staticmethod
    def calculate_energies(voronoi_areas, gaussian_curvatures,
                           mean_curvatures):
        a = np.asarray(voronoi_areas, dtype=np.float64)
        K = np.asarray(gaussian_curvatures, dtype=np.float64)
        H = np.asarray(mean_curvatures, dtype=np.float64)
        bending = float(np.nansum(H**2 * a))
        stretching = float(np.nansum(K * a))
        return bending, stretching

    # ---- normals & export (ref :691-726) ----
    def compute_normals(self, k: int = 50):
        from pct_tpu.mesh.normals import estimate_and_orient_normals

        nrm = np.asarray(estimate_and_orient_normals(
            self.cloud, k=min(k, max(4, self.num_points - 1))))
        self.normals = nrm[: self.num_points]
        return self.normals

    def export_ply_with_curvature_and_normals(self, path: str):
        from pct_tpu.io.ply import write_ply

        if self.K_quadratic is None:
            self.compute_pointwise_explicit_quadratic_curvature()
        if self.normals is None or not len(self.normals):
            self.compute_normals()
        n = self.num_points
        write_ply(path, self.points, self.normals[:n],
                  vertex_props={
                      "gaussian_curvature": self.K_quadratic[:n],
                      "mean_curvature": self.H_quadratic[:n]})
        return path

    # ---- transforms & filters (ref :123-268) ----
    def rotate_point_cloud(self, angle_x, angle_y, angle_z,
                           compat_z_from_y: bool = False):
        from pct_tpu.core import from_numpy
        from pct_tpu.utils.transforms import rotate_point_cloud

        self.points = rotate_point_cloud(self.points, angle_x, angle_y,
                                         angle_z,
                                         compat_z_from_y=compat_z_from_y)
        self.cloud = from_numpy(self.points)
        self.neighbor_indices = None
        return self.points

    def downsample_point_cloud_by_grid(self, voxel_size: float,
                                       max_points_per_voxel: int = 1):
        import jax.numpy as jnp

        from pct_tpu.core import from_numpy
        from pct_tpu.mesh.downsample import voxel_downsample

        out, kept = voxel_downsample(self.cloud.points, self.cloud.num_points,
                                     jnp.float32(voxel_size),
                                     max_per_voxel=max_points_per_voxel)
        self.points = np.asarray(out)[: int(kept)]
        self.num_points = self.points.shape[0]
        self.cloud = from_numpy(self.points)
        self.neighbor_indices = None
        return self.points

    # ---- plotting (ref :482-615, 952-1009) ----
    def plot_points_colored_by_quadratic_curvatures(self):
        from pct_tpu.viz.plots import plot_points_colored_by_curvature

        if self.K_quadratic is None:
            self.compute_pointwise_explicit_quadratic_curvature()
        n = self.num_points
        plot_points_colored_by_curvature(
            self.points, self.K_quadratic[:n], self.H_quadratic[:n],
            self.output_path, tag=f"_k{self.k_neighbors}")

    def plot_points_colored_by_quadric_curvatures(self):
        from pct_tpu.viz.plots import plot_points_colored_by_curvature

        if self.K_quadric is None:
            self.compute_pointwise_implicit_quadric_curvature()
        n = self.num_points
        plot_points_colored_by_curvature(
            self.points, self.K_quadric[:n], self.H_quadric[:n],
            self.output_path, tag=f"_quadric_k{self.k_neighbors}")

    def visualize_knn_for_n_random_points(self, num_samples: int = 5):
        from pct_tpu.viz.plots import visualize_knn_for_random_points

        self._ensure_neighbors()
        visualize_knn_for_random_points(self.points, self.neighbor_indices,
                                        self.output_path, num_samples)

    def plot_surface(self):
        from pct_tpu.viz.plots import plot_surface

        plot_surface(self.points, self.output_path)


# ---- utils.py-level functions (ref utils.py) ----

def parse_ply(path):
    """ref utils.py:979-1004."""
    from pct_tpu.io.ply import read_ply

    return read_ply(path).points


def save_points_to_ply(points, path):
    """ref utils.py:963-976."""
    from pct_tpu.io.ply import write_ply

    write_ply(path, np.asarray(points))


def average_distance_using_kd_tree(points, sample: int = 1000):
    """Mean 1-NN distance + the 25-radius BPA ladder (ref utils.py:441-470)."""
    from pct_tpu.core import from_numpy
    from pct_tpu.neighbors.bruteforce import mean_nn_distance

    cloud = from_numpy(np.asarray(points, np.float32))
    d = float(mean_nn_distance(cloud.points, cloud.num_points,
                               sample=min(1024, max(16, sample))))
    radii = np.linspace(0.025 * d, 5 * d, 25)
    return d, radii


def detect_boundary_loops(faces):
    """ref utils.py:407-436."""
    from pct_tpu.mesh.boundary import detect_boundary_loops as f

    return f(np.asarray(faces))


def estimate_curvature(points, k_fraction: float = 0.025,
                       max_neighbors: int = 100):
    """Surface-variation PCA curvature (ref utils.py:778-829)."""
    import jax.numpy as jnp

    from pct_tpu.core import from_numpy
    from pct_tpu.curvature.pca import surface_variation
    from pct_tpu.neighbors import knn_cloud_grid

    pts = np.asarray(points, np.float32)
    n = pts.shape[0]
    k = int(min(max(n * k_fraction, 3), max_neighbors, n - 1))
    cloud = from_numpy(pts)
    res, _ = knn_cloud_grid(cloud, k)
    idx = jnp.asarray(np.asarray(res.indices)[:n])
    return np.asarray(surface_variation(cloud.points, idx))


def get_characteristic_scale(points):
    """Max distance from the centroid (ref utils.py:767-775)."""
    pts = np.asarray(points, np.float64)
    return float(np.linalg.norm(pts - pts.mean(0), axis=1).max())


def generate_pv_shapes(shape_name: str, num_points: int,
                       perturbation_strength: float = 0.0,
                       desired_scale: float = 1.0, radius=None, seed=0):
    """ref utils.py:833-959 (radius kwarg aliases desired_scale, ref :854)."""
    from pct_tpu.shapes import generate_shape

    scale = radius if radius is not None else desired_scale
    return generate_shape(shape_name, num_points, radius=scale,
                          perturbation_strength=perturbation_strength,
                          seed=seed)


def create_mesh_with_curvature(file_path_or_points, shape_name="scan",
                               variant="none", **kw):
    """ref utils.py:20-377 (array-based; no temp-file handoff)."""
    from pct_tpu.pipeline.mesh_pipeline import create_mesh_with_curvature as f

    if isinstance(file_path_or_points, str):
        from pct_tpu.io import load_points

        pts, _ = load_points(file_path_or_points)
    else:
        pts = np.asarray(file_path_or_points, np.float32)
    return f(pts, **kw)


def load_mesh_compute_energies(vertices, faces, K_vertex, H_vertex):
    """ref utils.py:702-765, O(T) by construction."""
    import jax.numpy as jnp

    from pct_tpu.mesh.energies import mesh_energies

    e = mesh_energies(jnp.asarray(vertices, jnp.float32),
                      jnp.asarray(faces, jnp.int32),
                      jnp.asarray(K_vertex, jnp.float32),
                      jnp.asarray(H_vertex, jnp.float32))
    return float(e.bending), float(e.stretching), float(e.total_area)


def validate_shape(file_path, flag="N", shape_name="scan", variant="none",
                   radius=None, **kw):
    """ref utils.py:476-676 (flag='Y' enables the z-score outlier sweep —
    automated here, no input() prompts)."""
    from pct_tpu.validate.harness import validate_file

    res = validate_file(file_path, shape=shape_name, variant=variant,
                        radius=radius, outlier_filter=(flag != "N"), **kw)
    return res.bending_energy, res.stretching_energy, res.total_area
