"""Normal estimation + global sign consistency, fully on device.

Replaces Open3D ``estimate_normals`` (hybrid radius search, ref
utils.py:74-79) and ``orient_normals_consistent_tangent_plane(k=50)``
(ref utils.py:80) — the MST-based sign propagation that costs 11.6 s in
the reference profile. The MST is inherently sequential; the TPU-native
equivalent (SURVEY §2 table) is iterative neighbor-majority voting:

  n_i ← sign( Σ_j w_ij · sign(n_i·n_j) ) · n_i      over kNN neighbors

seeded deterministically (the normal of the highest-z point is forced
to +z, mirroring Open3D's convention of orienting the extremal point
outward). Converges in O(diameter) sweeps on orientable surfaces; on
non-orientable inputs (möbius strip stress case) it leaves a seam —
exactly as the reference's MST propagation does.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pct_tpu.fit.frames import neighborhood_covariance
from pct_tpu.fit.eigh3 import smallest_eigvec3


def estimate_raw_normals(points: jax.Array, indices: jax.Array,
                         tile: int = 16384):
    """(N,3) + (N,k) neighbor indices -> unoriented unit normals (N,3)."""
    n = indices.shape[0]
    pad = (-n) % tile
    idx = jnp.pad(indices, ((0, pad), (0, 0)))
    q = jnp.pad(points[:n], ((0, pad), (0, 0)))

    def one(args):
        i, qq = args
        nbrs = points[i] - qq[:, None, :]
        cov = neighborhood_covariance(nbrs)
        _, nrm = smallest_eigvec3(cov)
        return nrm

    out = jax.lax.map(one, (idx.reshape(-1, tile, idx.shape[1]),
                            q.reshape(-1, tile, 3)))
    return out.reshape(-1, 3)[:n]


@partial(jax.jit, static_argnames=("sweeps",))
def orient_normals(points: jax.Array, normals: jax.Array,
                   indices: jax.Array, num_points: jax.Array,
                   sweeps: int = 64,
                   seed_mask: jax.Array | None = None,
                   seed_signs: jax.Array | None = None):
    """Wavefront sign propagation over the kNN graph.

    A synchronous everyone-votes scheme oscillates (parallel Ising
    dynamics); instead the ORIENTED set grows monotonically from a seed:
    each sweep, every unoriented point adjacent to oriented points takes
    the sign of its cos-weighted vote over oriented neighbors only, then
    joins the oriented set — a parallel-wavefront version of the MST
    propagation Open3D uses (ref utils.py:80). Default seed: the
    highest-z valid point, oriented to +z (Open3D's extremal-point
    convention). ``seed_mask``/``seed_signs`` instead start the
    wavefront from MANY pre-oriented points at once (the hierarchical
    path in ``estimate_and_orient_normals``). Needs O(graph diameter)
    sweeps from one seed; unreached components keep their raw
    orientation.
    """
    n = points.shape[0]
    valid = jnp.arange(n, dtype=jnp.int32) < num_points

    dots = jnp.einsum("nkd,nd->nk", normals[indices], normals,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)

    def sweep(_, state):
        sign, oriented = state
        nbr_oriented = oriented[indices]                    # (N, k)
        vote = jnp.sum(jnp.where(nbr_oriented,
                                 dots * sign[indices], 0.0), axis=-1)
        frontier = (~oriented) & jnp.any(nbr_oriented, axis=-1) & valid
        new_sign = jnp.where(frontier,
                             jnp.where(vote < 0, -1.0, 1.0), sign)
        return new_sign, oriented | frontier

    if seed_mask is None:
        zvals = jnp.where(valid, points[:, 2], -jnp.inf)
        seed = jnp.argmax(zvals)
        seed_sign = jnp.where(normals[seed, 2] >= 0, 1.0, -1.0)
        sign0 = jnp.ones((n,), points.dtype).at[seed].set(seed_sign)
        oriented0 = jnp.zeros((n,), bool).at[seed].set(True)
    else:
        sign0 = jnp.where(seed_mask, seed_signs, 1.0).astype(points.dtype)
        oriented0 = seed_mask & valid
    sign, _ = jax.lax.fori_loop(0, sweeps, sweep, (sign0, oriented0))
    return normals * sign[:, None]


# above this size one extremal seed can't cross the kNN graph in an
# affordable sweep count (diameter ~ sqrt(N) on surfaces; 40 sweeps left
# 40% of a 300k torus mis-signed) — orient a strided coarse subset first
_HIER_THRESHOLD = 32768
_COARSE_TARGET = 16384


def estimate_and_orient_normals(cloud, k: int = 50, sweeps: int = 40):
    """Full replacement for the reference's estimate+orient pass
    (ref utils.py:74-80): grid kNN (k=50 default, as the reference's
    orient step) -> covariance normals -> voting orientation.

    Large clouds orient HIERARCHICALLY: a strided ~16k-point coarse
    subset (small graph diameter) runs the extremal-seed wavefront to
    convergence, then the full cloud's wavefront starts from ALL coarse
    points at once — each frontier only has to cross the coarse spacing
    (~sqrt(stride) hops), not the whole surface. Measured on the random
    torus: 300k went from 60% consistent signs (40 single-seed sweeps)
    to 100%.
    """
    import numpy as np

    from pct_tpu.core.cloud import from_numpy
    from pct_tpu.neighbors.knn import knn_cloud_grid

    res, _ = knn_cloud_grid(cloud, k)
    raw = estimate_raw_normals(cloud.points, res.indices)
    n = int(cloud.num_points)
    if n <= _HIER_THRESHOLD:
        return orient_normals(cloud.points, raw, res.indices,
                              cloud.num_points, sweeps=sweeps)

    stride = max(2, -(-n // _COARSE_TARGET))
    sel = np.arange(0, n, stride, dtype=np.int32)
    coarse_raw = raw[sel]
    ccloud = from_numpy(np.asarray(cloud.points[sel]))
    kc = min(16, len(sel) - 1)
    cres, _ = knn_cloud_grid(ccloud, kc)
    pad_c = ccloud.points.shape[0] - len(sel)
    craw = jnp.pad(coarse_raw, ((0, pad_c), (0, 0)))
    oriented_c = orient_normals(ccloud.points, craw, cres.indices,
                                ccloud.num_points, sweeps=512)[:len(sel)]
    csign = jnp.where(jnp.sum(oriented_c * coarse_raw, axis=-1) < 0.0,
                      -1.0, 1.0)
    seed_mask = jnp.zeros((cloud.points.shape[0],), bool).at[sel].set(True)
    seed_signs = jnp.ones((cloud.points.shape[0],),
                          cloud.points.dtype).at[sel].set(csign)
    fine_sweeps = max(sweeps, 4 * int(np.ceil(np.sqrt(stride))))
    return orient_normals(cloud.points, raw, res.indices, cloud.num_points,
                          sweeps=fine_sweeps, seed_mask=seed_mask,
                          seed_signs=seed_signs)
