"""Device voxel downsampling (grid-hash reuse).

Replaces Open3D ``voxel_down_sample`` (ref downsample.py:10) and the
commented-out ``downsample_point_cloud_by_grid``
(ref pointCloudToolbox.py:159-193, whose voxel logic — keep the first
``max_points_per_voxel`` points per voxel — survives only in comments
yet is still *invoked* when downsample=True, a reference crash we fix
by existing). Two modes:

- "first":    keep the first ``max_per_voxel`` points of each voxel in
              original order (reference-comment semantics; also
              convert_asc_to_ply.py:20-51 with max_per_voxel=1)
- "centroid": per-voxel mean (Open3D voxel_down_sample semantics)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pct_tpu.neighbors.grid import PAD_ID, build_grid


@partial(jax.jit, static_argnames=("max_per_voxel", "mode"))
def voxel_downsample(points: jax.Array, num_points: jax.Array,
                     voxel_size: jax.Array, max_per_voxel: int = 1,
                     mode: str = "first"):
    """Returns (points' (N,3) — kept rows compacted to the front and
    padded with PAD_VALUE, num_kept ()). Static output shape == input
    shape; slice host-side with num_kept if desired."""
    from pct_tpu.core.cloud import PointCloud

    n = points.shape[0]
    grid = build_grid(points, num_points, voxel_size)
    ids = grid.sorted_ids
    prev = jnp.concatenate([jnp.full((1,), -1, ids.dtype), ids[:-1]])
    is_first = (ids != prev) & (ids != PAD_ID)
    # rank within voxel = position - start of the voxel's run
    run_start = jnp.maximum(
        jax.lax.associative_scan(
            jnp.maximum,
            jnp.where(is_first, jnp.arange(n, dtype=jnp.int32), -1)),
        0)
    rank = jnp.arange(n, dtype=jnp.int32) - run_start

    if mode == "first":
        # "first in original order": within a voxel the stable sort keeps
        # original order, so rank < max_per_voxel matches the reference
        keep = (rank < max_per_voxel) & (ids != PAD_ID)
        kept_sorted = jnp.where(keep[:, None], grid.sorted_points,
                                PointCloud.PAD_VALUE)
        # compact kept rows to the front (stable sort by ~keep)
        order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
        out = kept_sorted[order]
        num_kept = jnp.sum(keep.astype(jnp.int32))
        return out, num_kept
    elif mode == "centroid":
        voxel_index = jnp.cumsum(is_first.astype(jnp.int32)) - 1
        valid = ids != PAD_ID
        w = valid.astype(points.dtype)
        sums = jnp.zeros((n, 3), points.dtype).at[voxel_index].add(
            grid.sorted_points * w[:, None])
        cnts = jnp.zeros((n,), points.dtype).at[voxel_index].add(w)
        num_kept = jnp.where(jnp.any(valid), voxel_index[-1] + 1, 0)
        slot_valid = jnp.arange(n) < num_kept
        out = jnp.where(slot_valid[:, None],
                        sums / jnp.maximum(cnts, 1.0)[:, None],
                        PointCloud.PAD_VALUE)
        return out, num_kept
    raise ValueError(f"unknown mode {mode!r}")
