"""Point-cloud data model: a statically-shaped, mask-padded jax pytree.

TPU-first redesign of the reference's ``PointCloud`` ctor/ingest
(ref pointCloudToolbox.py:26-66): instead of ragged numpy arrays and
file-system handoffs, a cloud is a pytree of device arrays padded to a
static capacity, with a traced ``num_points`` scalar for masking. All
downstream kernels are shape-stable across clouds of the same capacity
bucket, so XLA compiles once per bucket.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def pad_capacity(n: int, multiple: int = 1024) -> int:
    """Static capacity bucket for n points.

    Rounds up to ``multiple`` so clouds of similar size share one XLA
    compilation. 1024 = 8 sublanes x 128 lanes for f32 tiles.
    """
    return max(multiple, round_up(n, multiple))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """Padded point cloud.

    Attributes:
      points:  (capacity, 3) float32; rows >= num_points are padding
               (filled with the sentinel ``PAD_VALUE`` so they land in a
               far-away grid cell and never pollute neighbor queries).
      normals: (capacity, 3) float32 or None.
      num_points: () int32 — number of valid rows.
    """

    points: jax.Array
    num_points: jax.Array
    normals: Optional[jax.Array] = None

    PAD_VALUE = 1e9  # class constant, not a field

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def mask(self) -> jax.Array:
        """(capacity,) bool validity mask."""
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.num_points

    # ---- norms of the whole cloud (ref pointCloudToolbox.py:43-47) ----
    def norms(self) -> dict:
        m = self.mask()[:, None]
        pts = jnp.where(m, self.points, 0.0)
        flat = pts.reshape(-1)
        return {
            "l1": jnp.sum(jnp.abs(flat)),
            "l2": jnp.sqrt(jnp.sum(flat * flat)),
            "linf": jnp.max(jnp.abs(flat)),
        }

    def bounds(self) -> tuple[jax.Array, jax.Array]:
        """(min_xyz, max_xyz) over valid points."""
        m = self.mask()[:, None]
        big = jnp.float32(jnp.inf)
        lo = jnp.min(jnp.where(m, self.points, big), axis=0)
        hi = jnp.max(jnp.where(m, self.points, -big), axis=0)
        return lo, hi

    def domains(self) -> dict:
        """x/y/z extents (ref pointCloudToolbox.py:64-66)."""
        lo, hi = self.bounds()
        return {"x": (lo[0], hi[0]), "y": (lo[1], hi[1]), "z": (lo[2], hi[2])}


def from_numpy(
    points: np.ndarray,
    normals: Optional[np.ndarray] = None,
    capacity: Optional[int] = None,
    pad_multiple: int = 1024,
) -> PointCloud:
    """Host-side constructor: pad to a static capacity and move to device."""
    points = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    n = points.shape[0]
    cap = capacity if capacity is not None else pad_capacity(n, pad_multiple)
    if cap < n:
        raise ValueError(f"capacity {cap} < num points {n}")
    padded = np.full((cap, 3), PointCloud.PAD_VALUE, dtype=np.float32)
    padded[:n] = points
    nrm = None
    if normals is not None and np.asarray(normals).size:
        normals = np.asarray(normals, dtype=np.float32).reshape(-1, 3)
        nrm = np.zeros((cap, 3), dtype=np.float32)
        nrm[:n] = normals
        nrm = jnp.asarray(nrm)
    return PointCloud(
        points=jnp.asarray(padded),
        num_points=jnp.asarray(n, dtype=jnp.int32),
        normals=nrm,
    )


def to_numpy(cloud: PointCloud) -> tuple[np.ndarray, Optional[np.ndarray]]:
    """Device -> host, dropping padding."""
    n = int(cloud.num_points)
    pts = np.asarray(cloud.points[:n])
    nrm = None if cloud.normals is None else np.asarray(cloud.normals[:n])
    return pts, nrm
