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


def order_loop(be: np.ndarray, loop: np.ndarray) -> np.ndarray | None:
    """Walk a loop's boundary edges into an ordered vertex cycle.

    Returns None when the loop is not a simple cycle (some vertex has
    != 2 boundary edges — e.g. two holes sharing a vertex)."""
    sel = np.isin(be[:, 0], loop) & np.isin(be[:, 1], loop)
    adj: dict = {}
    for a, b in be[sel]:
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))
    if len(adj) != loop.size or any(len(v) != 2 for v in adj.values()):
        return None
    start = int(loop[0])
    cyc = [start]
    prev, cur = None, start
    while True:
        nxts = [v for v in adj[cur] if v != prev]
        if not nxts:
            return None
        nxt = nxts[0]
        if nxt == start:
            break
        cyc.append(nxt)
        prev, cur = cur, nxt
        if len(cyc) > loop.size:
            return None
    if len(cyc) != loop.size or len(cyc) < 3:
        return None
    return np.asarray(cyc, dtype=np.int64)


def _min_area_triangulation(P: np.ndarray) -> List[Tuple[int, int, int]]:
    """Minimum-total-area triangulation of an ordered 3D polygon chain
    (classic interval DP, O(L³)) — well-behaved on NON-planar loops
    where a projected Delaunay would fold."""
    L = len(P)

    def area(a, b, c):
        cr = np.cross(P[b] - P[a], P[c] - P[a])
        return 0.5 * float(np.sqrt((cr * cr).sum()))

    dp = np.zeros((L, L))
    choice = np.zeros((L, L), dtype=np.int64)
    for span in range(2, L):
        for i in range(L - span):
            j = i + span
            best, bm = None, i + 1
            for m in range(i + 1, j):
                cost = dp[i][m] + dp[m][j] + area(i, m, j)
                if best is None or cost < best:
                    best, bm = cost, m
            dp[i][j], choice[i][j] = best, bm
    tris: List[Tuple[int, int, int]] = []

    def rec(i, j):
        if j - i < 2:
            return
        m = int(choice[i][j])
        tris.append((i, m, j))
        rec(i, m)
        rec(m, j)

    rec(0, L - 1)
    return tris


def fill_holes_by_size(vertices: np.ndarray, faces: np.ndarray,
                       hole_size: float,
                       max_loop: int = 256) -> Tuple[np.ndarray, int]:
    """Final large-hole pass (ref utils.py:338-345: pyvista
    ``fill_holes(hole_size=bbox_avg/10)`` after Taubin smoothing).

    Fills every simple boundary loop whose bounding radius is below
    ``hole_size`` — planar or not: the loop is ordered by edge-walking
    and triangulated by minimum-area interval DP (fan from vertex 0 for
    loops longer than ``max_loop``, where O(L³) DP stops paying).
    Returns (faces', n_filled).
    """
    loops = detect_boundary_loops(faces)
    if not loops:
        return faces, 0
    be = boundary_edges(faces)
    new_faces = [faces.astype(np.int64)]
    filled = 0
    for loop in loops:
        if loop.size < 3:
            continue
        pts = vertices[loop]
        radius = float(np.linalg.norm(pts - pts.mean(0), axis=1).max())
        if radius > hole_size:
            continue
        cyc = order_loop(be, loop)
        if cyc is None:
            continue
        if cyc.size <= max_loop:
            tris = _min_area_triangulation(vertices[cyc])
        else:
            tris = [(0, i, i + 1) for i in range(1, cyc.size - 1)]
        if tris:
            new_faces.append(cyc[np.asarray(tris, dtype=np.int64)])
            filled += 1
    return np.concatenate(new_faces, axis=0), filled


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
