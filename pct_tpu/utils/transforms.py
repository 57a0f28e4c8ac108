"""Geometry transforms (parity with ref pointCloudToolbox.py:123-157).

``rotate_point_cloud``: axis-swap + lexsort, center, rotate by three
Euler matrices, un-center. The reference builds its Z matrix from the
Y angle (ref :149-153) — a bug we fix by default; pass
``compat_z_from_y=True`` to reproduce the reference's actual output.
"""

from __future__ import annotations

import numpy as np


def _rx(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _ry(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def rotate_point_cloud(points: np.ndarray, angle_x: float, angle_y: float,
                       angle_z: float, compat_z_from_y: bool = False,
                       lexsort: bool = True) -> np.ndarray:
    """Swap axes + lexsort (ref :126-129), center, apply Rx·Ry·Rz,
    un-center (ref :156-157)."""
    pts = np.asarray(points, dtype=np.float64)
    if lexsort:
        pts = pts[:, [0, 2, 1]]                  # axis swap (ref :126)
        pts = pts[np.lexsort(pts.T[::-1])]       # lexsort rows
    center = pts.mean(0)
    c = pts - center
    Rz = _rz(angle_y if compat_z_from_y else angle_z)  # ref bug at :149-153
    R = _rx(angle_x) @ _ry(angle_y) @ Rz
    return (c @ R.T + center).astype(np.float32)
