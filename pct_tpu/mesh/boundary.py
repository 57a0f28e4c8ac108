"""Boundary-loop detection and small-hole filling.

Parity with ref utils.py:407-436 ``detect_boundary_loops`` (edges used
by fewer than 2 triangles are boundary; loops = connected components)
and the hole-fill pass of ``create_mesh_with_curvature``
(ref utils.py:151-232): loops whose perimeter is below
0.5 × mean-bbox-extent are planarity-tested (SVD), projected to their
dominant plane, and triangulated (Delaunay, convex-hull fallback).

Boundary loops are tiny (hundreds of edges at most) — this stays on
host numpy/scipy by design (SURVEY §2 native-replacement table: "host
union-find, fine to keep in Python"); scipy's Qhull handles the small
Delaunay instances exactly as the reference's did.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def boundary_edges(faces: np.ndarray) -> np.ndarray:
    """(T,3) -> (B,2) edges appearing in exactly one face (ref :418-427)."""
    e = np.concatenate([faces[:, (0, 1)], faces[:, (1, 2)], faces[:, (2, 0)]])
    e = np.sort(e, axis=1)
    uniq, counts = np.unique(e, axis=0, return_counts=True)
    return uniq[counts < 2]


class _UnionFind:
    def __init__(self, items):
        self.parent = {i: i for i in items}

    def find(self, x):
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb


def detect_boundary_loops(faces: np.ndarray) -> List[np.ndarray]:
    """Connected components of the boundary-edge graph (ref :430-436),
    union-find instead of networkx."""
    be = boundary_edges(faces)
    if be.size == 0:
        return []
    verts = np.unique(be)
    uf = _UnionFind(verts.tolist())
    for a, b in be:
        uf.union(int(a), int(b))
    groups: dict = {}
    for v in verts:
        groups.setdefault(uf.find(int(v)), []).append(int(v))
    return [np.asarray(sorted(g), dtype=np.int64) for g in groups.values()]


def loop_perimeter(vertices: np.ndarray, loop: np.ndarray,
                   faces: np.ndarray,
                   be: np.ndarray | None = None) -> float:
    """Sum of boundary-edge lengths belonging to the loop (ref :170).
    Pass precomputed ``boundary_edges(faces)`` to avoid re-extracting
    the (loop-independent) edge set per loop."""
    if be is None:
        be = boundary_edges(faces)
    sel = np.isin(be[:, 0], loop) & np.isin(be[:, 1], loop)
    e = be[sel]
    return float(np.linalg.norm(vertices[e[:, 0]] - vertices[e[:, 1]],
                                axis=1).sum())


def is_planar(points: np.ndarray, tol: float = 1e-2) -> bool:
    """SVD planarity test (ref utils.py:22-38): smallest singular value of
    the centered cloud below tol × largest."""
    c = points - points.mean(0)
    s = np.linalg.svd(c, compute_uv=False)
    if s[0] <= 0:
        return True
    return bool(s[-1] / s[0] < tol)


def fill_hole(vertices: np.ndarray, loop: np.ndarray) -> np.ndarray:
    """Triangulate one small hole: project the loop onto its dominant
    plane (drop the smallest-variance axis, ref :183-184), Delaunay in
    2D, keep triangles whose vertices are all on the loop; convex-hull
    fan fallback (ref :187-206). Returns (F,3) int64 faces (global ids).
    """
    pts = vertices[loop]
    if loop.size < 3:
        return np.zeros((0, 3), np.int64)
    c = pts - pts.mean(0)
    _, _, Vt = np.linalg.svd(c, full_matrices=False)
    plane = c @ Vt[:2].T          # project out the normal direction
    try:
        from scipy.spatial import Delaunay

        tri = Delaunay(plane)
        faces = loop[tri.simplices]
    except Exception:
        try:
            from scipy.spatial import ConvexHull

            hull = ConvexHull(plane)
            order = hull.vertices
            fan = [(order[0], order[i], order[i + 1])
                   for i in range(1, len(order) - 1)]
            faces = loop[np.asarray(fan, dtype=np.int64)]
        except Exception:
            return np.zeros((0, 3), np.int64)
    return faces.astype(np.int64)


def fill_small_holes(vertices: np.ndarray, faces: np.ndarray,
                     perimeter_factor: float = 0.5,
                     planar_tol: float = 1e-2) -> Tuple[np.ndarray, int]:
    """Detect loops, fill those with perimeter < factor × mean bbox extent
    (ref :173) and passing the planarity test; returns (faces', n_filled).
    """
    bbox = vertices.max(0) - vertices.min(0)
    threshold = perimeter_factor * float(bbox.mean())
    loops = detect_boundary_loops(faces)
    be = boundary_edges(faces)
    new_faces = [faces]
    filled = 0
    for loop in loops:
        if loop.size < 3:
            continue
        if loop_perimeter(vertices, loop, faces, be) >= threshold:
            continue
        if not is_planar(vertices[loop], planar_tol):
            continue
        f = fill_hole(vertices, loop)
        if f.size:
            new_faces.append(f)
            filled += 1
    return np.concatenate(new_faces, axis=0), filled
