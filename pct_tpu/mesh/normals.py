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


@partial(jax.jit, static_argnames=("sweeps", "consensus"))
def orient_normals(points: jax.Array, normals: jax.Array,
                   indices: jax.Array, num_points: jax.Array,
                   sweeps: int = 64,
                   seed_mask: jax.Array | None = None,
                   seed_signs: jax.Array | None = None,
                   consensus: int = 8):
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

    # state encoding: 0 = unoriented, ±1 = oriented sign — ONE (N,k)
    # gather per sweep instead of two (the bool + sign pair of gathers
    # cost 0.85 s/sweep at 1M×50: TPU row gathers of scalar-width
    # payloads dominate this loop; measured 33.9 s for 40 sweeps)
    def sweep(_, state):
        s_n = state[indices]                                # (N, k)
        vote = jnp.sum(dots * s_n, axis=-1)
        frontier = (state == 0.0) & jnp.any(s_n != 0.0, axis=-1) & valid
        return jnp.where(frontier,
                         jnp.where(vote < 0, -1.0, 1.0), state)

    if seed_mask is None:
        zvals = jnp.where(valid, points[:, 2], -jnp.inf)
        seed = jnp.argmax(zvals)
        seed_sign = jnp.where(normals[seed, 2] >= 0, 1.0, -1.0)
        state0 = jnp.zeros((n,), points.dtype).at[seed].set(seed_sign)
    else:
        state0 = jnp.where(seed_mask & valid, seed_signs, 0.0).astype(
            points.dtype)
    state = jax.lax.fori_loop(0, sweeps, sweep, state0)
    # never-reached rows keep the raw orientation (sign +1)
    sign = jnp.where(state == 0.0, 1.0, state)

    # consensus relaxation: the wavefront fixes each point ONCE, so a
    # marginal early vote near a pinch/thin region can cascade into a
    # mis-signed pocket. Re-vote every point against the fully oriented
    # state and flip strict losers; converges in a handful of sweeps
    # (measured on the 6k cyclide: sign agreement 0.984 -> 0.996,
    # convergence at sweep 7; a clean sphere/torus flips nothing). On
    # non-orientable inputs the bounded sweep count leaves the seam in
    # place, as the wavefront alone did.
    def cons_sweep(_, s):
        vote = jnp.sum(dots * s[indices], axis=-1)
        return jnp.where(valid & (s * vote < 0.0), -s, s)

    if consensus:
        sign = jax.lax.fori_loop(0, consensus, cons_sweep, sign)
    return normals * sign[:, None]


# above this size one extremal seed can't cross the kNN graph in an
# affordable sweep count (diameter ~ sqrt(N) on surfaces; 40 sweeps left
# 40% of a 300k torus mis-signed) — orient a strided coarse subset first
_HIER_THRESHOLD = 32768
_COARSE_TARGET = 16384


def _invert_order(order):
    return jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=jnp.int32))


@partial(jax.jit, static_argnames=("k",))
def _probe_grid(points, num_points, k: int):
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size

    return build_grid(points, num_points,
                      estimate_cell_size(points, num_points, k))


@partial(jax.jit, static_argnames=("k", "kc", "stride", "sweeps_coarse",
                                   "sweeps_fine", "hierarchical", "spec",
                                   "max_cells", "voters"))
def _normals_device(points, num_points, cell_size, k: int, kc: int,
                    stride: int, sweeps_coarse: int, sweeps_fine: int,
                    hierarchical: bool, spec: tuple, max_cells: int,
                    voters: int = 12):
    """The ENTIRE estimate+orient pass as one XLA program.

    The previous implementation staged knn_cloud_grid (host probe +
    exactness-repair sync) and the hierarchical coarse pass through
    ~15 eager ops — each a 0.4 s round-trip over the TPU tunnel, ~10 s
    of pure latency per mesh-pipeline call at 200k (measured, sweep
    t_normals column). Here everything runs device-side; the caller
    supplies probe-tuned bucket statics (``spec``/``max_cells`` — an
    UNPROBED 27·capacity cand_cap at k=50 is exactly the hostile
    single-bucket Mosaic static CLAUDE.md warns about, observed >17 min
    compile). The kNN skips the exactness repair — sign voting and
    covariance normals are robust to a rare truncated neighbor list,
    so the certificate machinery buys nothing on this path.
    """
    from pct_tpu.neighbors.cellknn import (
        compact_cells,
        knn_all_points,
        knn_cellwise_bucketed,
    )
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size

    grid = build_grid(points, num_points, cell_size)
    cells = compact_cells(grid, max_cells)
    res = knn_cellwise_bucketed(grid, cells, k, spec)
    idx = res.indices[_invert_order(grid.order)]   # original-order rows
    raw = estimate_raw_normals(points, idx)
    # orientation only needs CONNECTIVITY — vote over the ``voters``
    # nearest (default 12; the full k=50 graph quadruples the sweep
    # gather volume for no extra wavefront reach; raw normals keep the
    # full neighborhoods). Sign consistency under the truncation is
    # gated on high-genus geometry by tests/test_mesh.py
    # (cyclide + möbius regression).
    idx_o = idx[:, :min(voters, idx.shape[1])]
    if not hierarchical:
        return orient_normals(points, raw, idx_o, num_points,
                              sweeps=sweeps_fine)

    ncap = points.shape[0]
    n_sel = (ncap + stride - 1) // stride
    sel = jnp.arange(n_sel, dtype=jnp.int32) * stride
    valid_c = sel < num_points                     # prefix mask (sel asc)
    cpts = jnp.where(valid_c[:, None], points[sel], 0.0)
    m_c = jnp.sum(valid_c.astype(jnp.int32))
    cell_c = estimate_cell_size(cpts, m_c, kc)
    grid_c = build_grid(cpts, m_c, cell_c)
    # coarse cloud (~16k, kc<=16): fixed capacity statics stay in the
    # Mosaic-safe class (C=56, M~1.5k)
    res_c = knn_all_points(grid_c, kc)
    idx_c = res_c.indices[_invert_order(grid_c.order)]
    raw_c = raw[sel]
    oriented_c = orient_normals(cpts, raw_c, idx_c, m_c,
                                sweeps=sweeps_coarse)
    csign = jnp.where(jnp.sum(oriented_c * raw_c, axis=-1) < 0.0, -1.0, 1.0)
    seed_mask = jnp.zeros((ncap,), bool).at[sel].set(valid_c)
    seed_signs = jnp.ones((ncap,), points.dtype).at[sel].set(csign)
    return orient_normals(points, raw, idx_o, num_points, sweeps=sweeps_fine,
                          seed_mask=seed_mask, seed_signs=seed_signs)


@partial(jax.jit, static_argnames=("kv", "kc", "stride", "sweeps_coarse",
                                   "sweeps_fine", "hierarchical", "spec_v",
                                   "max_cells_v"))
def _orient_device(points, num_points, cell_size_v, raw, kv: int, kc: int,
                   stride: int, sweeps_coarse: int, sweeps_fine: int,
                   hierarchical: bool, spec_v: tuple, max_cells_v: int):
    """Voter kNN + wavefront orientation of caller-supplied RAW normals.

    The voter graph is a SMALL select (kv ~ 12) on the SAME k-sized grid
    the raw normals used: the candidate set and tie order match the old
    combined pass's k=50 select exactly, so the voters are bit-identical
    to its first-12-of-50 wherever both find kv real neighbors — but the
    kernel unrolls only kv rounds, leaving the k=50 select class (the
    static family behind the round-4 scoped-VMEM OOM and the 30-min
    Mosaic compiles, sweep_r4_200k_perturbed.csv) entirely uncompiled."""
    from pct_tpu.neighbors.cellknn import (
        compact_cells,
        knn_all_points,
        knn_cellwise_bucketed,
    )
    from pct_tpu.neighbors.grid import build_grid, estimate_cell_size

    grid_v = build_grid(points, num_points, cell_size_v)
    cells_v = compact_cells(grid_v, max_cells_v)
    res_v = knn_cellwise_bucketed(grid_v, cells_v, kv, spec_v)
    idx_o = res_v.indices[_invert_order(grid_v.order)]
    if not hierarchical:
        return orient_normals(points, raw, idx_o, num_points,
                              sweeps=sweeps_fine)

    ncap = points.shape[0]
    n_sel = (ncap + stride - 1) // stride
    sel = jnp.arange(n_sel, dtype=jnp.int32) * stride
    valid_c = sel < num_points                     # prefix mask (sel asc)
    cpts = jnp.where(valid_c[:, None], points[sel], 0.0)
    m_c = jnp.sum(valid_c.astype(jnp.int32))
    cell_c = estimate_cell_size(cpts, m_c, kc)
    grid_c = build_grid(cpts, m_c, cell_c)
    res_c = knn_all_points(grid_c, kc)
    idx_c = res_c.indices[_invert_order(grid_c.order)]
    raw_c = raw[sel]
    oriented_c = orient_normals(cpts, raw_c, idx_c, m_c,
                                sweeps=sweeps_coarse)
    csign = jnp.where(jnp.sum(oriented_c * raw_c, axis=-1) < 0.0, -1.0, 1.0)
    seed_mask = jnp.zeros((ncap,), bool).at[sel].set(valid_c)
    seed_signs = jnp.ones((ncap,), points.dtype).at[sel].set(csign)
    return orient_normals(points, raw, idx_o, num_points, sweeps=sweeps_fine,
                          seed_mask=seed_mask, seed_signs=seed_signs)


def estimate_and_orient_normals(cloud, k: int = 50, sweeps: int = 40,
                                voters: int = 12):
    """Full replacement for the reference's estimate+orient pass
    (ref utils.py:74-80): grid kNN (k=50 default, as the reference's
    orient step) -> covariance normals -> voting orientation. One
    device call (``_normals_device``), zero host round-trips.

    Large clouds orient HIERARCHICALLY: a strided ~16k-point coarse
    subset (small graph diameter) runs the extremal-seed wavefront to
    convergence, then the full cloud's wavefront starts from ALL coarse
    points at once — each frontier only has to cross the coarse spacing
    (~sqrt(stride) hops), not the whole surface. Measured on the random
    torus: 300k went from 60% consistent signs (40 single-seed sweeps)
    to 100%. Statics derive from the padded capacity so no device sync
    is needed to choose the route.
    """
    import numpy as np

    from pct_tpu.neighbors.cellknn import probe_grid_buckets

    ncap = cloud.points.shape[0]
    k = min(k, max(4, ncap - 1))
    hier = ncap > _HIER_THRESHOLD
    stride = max(2, -(-ncap // _COARSE_TARGET)) if hier else 1
    n_sel = (ncap + stride - 1) // stride if hier else ncap
    kc = min(16, max(4, n_sel - 1))
    fine = (max(sweeps, 4 * int(np.ceil(np.sqrt(stride))))
            if hier else sweeps)
    if k >= 32:
        # large-k raw normals via the MOMENT engine (round 5): the k=50
        # LIST select is exactly the static family behind the round-4
        # scoped-VMEM OOM and the 30-min Mosaic compiles on perturbed
        # clouds — the moment kernel's O(32·M) count passes with
        # split_to=128 statics stay in the seconds-class everywhere,
        # and its epilogue already emits the fit normal (same k-nearest
        # neighborhood; sign fixed by the voting below either way).
        from pct_tpu.pipeline.fused import fused_curvature

        grid_m = _probe_grid(cloud.points, cloud.num_points, k)
        spec_m, mc_m, factor = probe_grid_buckets(
            grid_m, capacity_cap=max(256, 4 * k), split_to=128)
        raw = fused_curvature(cloud.points, cloud.num_points,
                              grid_m.cell_size, k=k, max_cells=mc_m,
                              bucket_spec=spec_m, engine="moments",
                              split=(128, factor)).normals
        kv = min(voters, k)
        # voter graph on the SAME k-sized grid (unsplit statics): the
        # candidate windows match the old k=50 pass, so the kv winners
        # are its first kv-of-k bit-identically (a kv-sized grid's
        # narrower windows measurably perturbed ~5% of cyclide voter
        # sets and cost 1.6% sign agreement)
        spec_v, mc_v = probe_grid_buckets(grid_m,
                                          capacity_cap=max(256, 4 * k))
        return _orient_device(cloud.points, cloud.num_points,
                              grid_m.cell_size, raw, kv=kv, kc=kc,
                              stride=stride, sweeps_coarse=512,
                              sweeps_fine=fine, hierarchical=hier,
                              spec_v=spec_v, max_cells_v=mc_v)
    # small k: the combined list-select pass (one jit, Mosaic-safe at
    # k < 32 by the select plan)
    grid = _probe_grid(cloud.points, cloud.num_points, k)
    spec, mc = probe_grid_buckets(grid, capacity_cap=max(256, 4 * k))
    return _normals_device(cloud.points, cloud.num_points, grid.cell_size,
                           k=k, kc=kc,
                           stride=stride, sweeps_coarse=512,
                           sweeps_fine=fine, hierarchical=hier,
                           spec=spec, max_cells=mc,
                           voters=min(voters, k))
