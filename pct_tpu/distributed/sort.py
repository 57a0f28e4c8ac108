"""Distributed grid build: sample-sort of the cloud over the device mesh.

The slab layer (distributed/slab.py) keeps each chip resident on its own
spatial slab — but it previously built the cell-sorted order with ONE
replicated XLA sort, which caps the design at clouds that fit a single
chip's HBM. This module removes that cap: each chip sorts only its own
shard and the global cell-sorted order is assembled with a handful of
ICI collectives, O(n/d) memory and O((n/d)·log) work per chip.

The reference has no distributed story at all (SURVEY.md §2: strictly
single-process scipy); this is the TPU-native scale-out design
obligation, done the canonical sample-sort way:

0. **round-robin shuffle** — one balanced `all_to_all` mixes each
   shard's (usually spatially coherent) rows across the mesh, so no
   single (sender, destination) pair can concentrate a whole shard and
   blow the static exchange capacity;
1. **local quantize + sort** — global bbox via `pmin`/`pmax` (so every
   shard quantizes bit-identically to the replicated ``build_grid``),
   then one local stable sort of n/d rows;
2. **sampled splitters** — each shard contributes ``samples`` evenly
   spaced sorted (cell id, original row) pairs; one `all_gather`
   (2·d·samples ints), every shard sorts the pool and reads the d-1
   quantile splitters. Two-key splitters mean even a giant tie group
   (one cell holding most of the cloud) splits across shards by
   original row instead of landing whole on one destination;
3. **all_to_all exchange** — each shard's sorted rows fall into d
   contiguous destination segments; segments are packed into static
   (d, send_cap) buffers and exchanged with one `all_to_all` (the
   static capacity is the price of XLA's static shapes — segment
   overflow is DETECTED and flagged, never silent);
4. **local merge** — one 2-key `lax.sort` by (cell id, original row):
   the exact total order of the replicated stable argsort, independent
   of arrival order;
5. **exact rebalance** — shards now hold the right ROWS but not the
   right COUNTS; every row's exact global rank is known from an
   `all_gather` of the d per-shard counts, so rows within ``edge``
   positions of a shard boundary `ppermute` one hop to their owner and
   every shard scatters rows of rank [i·n/d, (i+1)·n/d) into its slab.

The output is BIT-IDENTICAL to ``build_grid(...)`` sharded over the
mesh — same stable tie order (original row order), same padding layout
(padding rows ride the exchange like data, so even their sentinel
coordinates land where the replicated sort puts them) — so the slab
pipeline, its halo exchange, and its id-range exactness certificate run
unchanged on top. ``ok`` certifies the assembly: False means a static
capacity (send_cap or edge) was exceeded and rows were dropped — degrade
to the replicated build or raise, never trust silently (the same
certify-don't-guess contract as the kNN exactness certificates).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pct_tpu.distributed.sharding import POINTS_AXIS
from pct_tpu.neighbors.grid import (
    PAD_ID,
    GridIndex,
    build_grid,
    grid_geometry,
    quantize_ids,
)

_HUGE = jnp.int32(1 << 30)  # rank sentinel: past any real rank (< n <= 2^24)


class DistGrid(NamedTuple):
    grid: GridIndex     # row arrays sharded over POINTS_AXIS
    ok: jax.Array       # () bool — every row reached its owner shard


def _local_sort_shard(points, num_points, cell_size, *, d, nl, samples,
                      send_cap, edge):
    """shard_map body: one shard's side of the sample sort."""
    axis = POINTS_AXIS
    di = jax.lax.axis_index(axis)
    base = di * nl
    a2a = partial(jax.lax.all_to_all, axis_name=axis, split_axis=0,
                  concat_axis=0, tiled=True)
    rows = base + jnp.arange(nl, dtype=jnp.int32)   # original GLOBAL rows
    # --- 0. round-robin shuffle: input shards are usually spatially
    # coherent (scan order), which would concentrate a whole shard onto
    # one destination and blow the static per-(sender,dest) send_cap.
    # One balanced all_to_all (local row j -> shard j mod d) mixes every
    # shard's rows so each (sender,dest) segment concentrates to ~nl/d.
    # Tie order is NOT entrusted to arrival order anywhere downstream
    # (the merge sorts by (id, original row)), so the shuffle is free.
    if nl % d == 0:
        def shuf(a):
            b = a.reshape((nl // d, d) + a.shape[1:])
            return a2a(jnp.swapaxes(b, 0, 1).reshape(a.shape))

        points = shuf(points)
        rows = shuf(rows)

    # --- 1. quantize with the GLOBAL bbox (bit-identical to build_grid) ---
    valid = rows < num_points
    big = jnp.float32(jnp.inf)
    lo = jax.lax.pmin(
        jnp.min(jnp.where(valid[:, None], points, big), axis=0), axis)
    hi = jax.lax.pmax(
        jnp.max(jnp.where(valid[:, None], points, -big), axis=0), axis)
    origin, dims, cell_size = grid_geometry(lo, hi, cell_size)
    ids = quantize_ids(points, valid, origin, cell_size, dims)
    # local sort by the GLOBAL total order (id, original row) — the same
    # order the replicated stable argsort induces. Padding rows ride
    # along as ordinary rows (id PAD_ID, order = original row): they
    # sort to exactly build_grid's padding positions CARRYING THEIR
    # TRUE COORDS, so the output is bit-identical even in pad slots.
    ids_s, order_s, px, py, pz = jax.lax.sort(
        (ids, rows, points[:, 0], points[:, 1], points[:, 2]), num_keys=2)
    pts_s = jnp.stack([px, py, pz], axis=-1)

    # --- 2. splitters from an all-gathered sample of the sorted rows ---
    # evenly spaced positions cover the local distribution; PAD_ID
    # samples (padding-heavy shards) push splitters right, which only
    # skews counts — the rebalance pass makes the final slabs exact.
    # Splitters are (id, original row) PAIRS: a giant tie group (many
    # points in one cell — think a lattice plane or duplicated scans)
    # then splits across destination shards by original row instead of
    # landing whole on one shard and blowing its capacity.
    pos = jnp.arange(samples, dtype=jnp.int32) * (nl // samples)
    pool_id = jax.lax.all_gather(ids_s[pos], axis).reshape(-1)   # (d*s,)
    pool_or = jax.lax.all_gather(order_s[pos], axis).reshape(-1)
    pool_id, pool_or = jax.lax.sort((pool_id, pool_or), num_keys=2)
    q = ((jnp.arange(d - 1, dtype=jnp.int32) + 1) * (d * samples)) // d - 1
    s_id = pool_id[q]                                            # (d-1,)
    s_or = pool_or[q]

    # --- 3. pack destination segments + all_to_all ---
    # dest = count of splitter pairs lexicographically below the row;
    # nondecreasing over the (id, order)-sorted rows by construction.
    below = ((s_id[None, :] < ids_s[:, None])
             | ((s_id[None, :] == ids_s[:, None])
                & (s_or[None, :] < order_s[:, None])))
    dest = jnp.sum(below.astype(jnp.int32), axis=1)              # (nl,)
    seg_start = jnp.searchsorted(
        dest, jnp.arange(d, dtype=jnp.int32), side="left").astype(jnp.int32)
    slot_in_seg = jnp.arange(nl, dtype=jnp.int32) - seg_start[dest]
    send_lost = jnp.any(slot_in_seg >= send_cap)
    slot = jnp.where(slot_in_seg < send_cap,
                     dest * send_cap + slot_in_seg, d * send_cap)

    def pack(a, fill):
        buf = jnp.full((d * send_cap,) + a.shape[1:], fill, a.dtype)
        return buf.at[slot].set(a, mode="drop")

    rids = a2a(pack(ids_s, PAD_ID))
    rpts = a2a(pack(pts_s, jnp.float32(0)))
    rord = a2a(pack(order_s, _HUGE))

    # --- 4. local merge by (id, original row): the same total order as
    # the replicated stable argsort (ties resolve by original row), and
    # independent of the arrival order the shuffle scrambled. Unused
    # buffer slots (PAD_ID, order _HUGE) sort past every real row —
    # including real padding rows, whose order is their original row. ---
    mids, mord, mx, my, mz = jax.lax.sort(
        (rids, rord, rpts[:, 0], rpts[:, 1], rpts[:, 2]), num_keys=2)
    mpts = jnp.stack([mx, my, mz], axis=-1)
    v = jnp.sum((mord != _HUGE).astype(jnp.int32))    # my rows (incl. pad)

    # --- 5. exact rebalance to n/d rows per shard ---
    counts = jax.lax.all_gather(v, axis)                         # (d,)
    start = jnp.cumsum(counts) - counts                          # excl. prefix
    total = jnp.sum(counts)
    mpos = jnp.arange(d * send_cap, dtype=jnp.int32)
    rank = jnp.where(mpos < v, start[di] + mpos, _HUGE)
    # every row must reach its owner shard in one ppermute hop: it may
    # only be out of reach if it sits deeper than ``edge`` from the
    # boundary it has to cross (or needs to cross two boundaries)
    owner = jnp.clip(rank // nl, 0, d - 1)
    real = mpos < v
    stuck = real & (
        (owner < di - 1) | (owner > di + 1)
        | ((owner == di - 1) & (mpos >= edge))
        | ((owner == di + 1) & (mpos < v - edge)))
    lost = jnp.any(stuck) | send_lost

    def edge_block(a, off):
        return jax.lax.dynamic_slice_in_dim(a, off, edge, axis=0)

    tail_off = jnp.clip(v - edge, 0, d * send_cap - edge)
    perm_r = [(i, (i + 1) % d) for i in range(d)]
    perm_l = [(i, (i - 1) % d) for i in range(d)]
    from_left = [jax.lax.ppermute(edge_block(a, tail_off), axis, perm_r)
                 for a in (rank, mids, mpts, mord)]
    from_right = [jax.lax.ppermute(edge_block(a, 0), axis, perm_l)
                  for a in (rank, mids, mpts, mord)]
    # wrap-around blocks are bogus: mask their ranks out of range
    from_left[0] = jnp.where(di == 0, _HUGE, from_left[0])
    from_right[0] = jnp.where(di == d - 1, _HUGE, from_right[0])

    crank = jnp.concatenate([from_left[0], rank, from_right[0]])
    cids = jnp.concatenate([from_left[1], mids, from_right[1]])
    cpts = jnp.concatenate([from_left[2], mpts, from_right[2]])
    cord = jnp.concatenate([from_left[3], mord, from_right[3]])
    tslot = crank - base
    keep = (crank < total) & (tslot >= 0) & (tslot < nl)
    tslot = jnp.where(keep, tslot, nl)

    # defaults only surface when rows were LOST (flagged): missing slots
    # degrade to inert padding (PAD_ID id, origin coords, slab-row order)
    out_ids = jnp.full((nl,), PAD_ID, jnp.int32).at[tslot].set(
        cids, mode="drop")
    out_pts = jnp.zeros((nl, 3), jnp.float32).at[tslot].set(
        cpts, mode="drop")
    slab_rows = base + jnp.arange(nl, dtype=jnp.int32)
    out_ord = slab_rows.at[tslot].set(cord, mode="drop")
    ok = jax.lax.psum(lost.astype(jnp.int32), axis) == 0
    return out_pts, out_ord, out_ids, origin, cell_size, dims, ok


def build_grid_distributed(
    mesh: Mesh,
    points: jax.Array,
    num_points: jax.Array,
    cell_size: jax.Array,
    samples: int = 256,
    send_cap: int | None = None,
    edge: int | None = None,
) -> DistGrid:
    """``build_grid`` without the replicated sort: O(n/d) per chip.

    ``points`` is (n, 3) with n divisible by the mesh size (shard it
    P('points') or let jit reshard). ``samples`` controls splitter
    quality (d·samples ids are gathered); ``send_cap`` is the static
    per-destination exchange capacity (default 2× the balanced share);
    ``edge`` is the static rebalance window (default 4·n/(d·samples)
    expected imbalance, floored at 256). Returns row arrays sharded over
    the mesh plus the ``ok`` certificate; on ``ok=False`` fall back to
    the replicated ``build_grid`` (capacities, not correctness, were
    exceeded — detection is the contract).
    """
    n = points.shape[0]
    d = len(mesh.devices.ravel())
    if d == 1:
        return DistGrid(build_grid(points, num_points, cell_size),
                        jnp.bool_(True))
    assert n % d == 0, "point capacity must divide the mesh size"
    nl = n // d
    samples = min(samples, nl)
    if send_cap is None:
        send_cap = min(nl, 2 * ((nl + d - 1) // d) + 64)
    if edge is None:
        edge = min(max(256, (4 * n) // (d * samples)), nl, d * send_cap)
    edge = min(edge, d * send_cap)

    body = partial(_local_sort_shard, d=d, nl=nl, samples=samples,
                   send_cap=send_cap, edge=edge)
    shard_fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(POINTS_AXIS, None), P(), P()),
        out_specs=(P(POINTS_AXIS, None), P(POINTS_AXIS), P(POINTS_AXIS),
                   P(), P(), P(), P()),
        check_vma=False,
    )
    pts, order, ids, origin, cell, dims, ok = shard_fn(
        points, num_points, cell_size)
    grid = GridIndex(sorted_points=pts, order=order, sorted_ids=ids,
                     origin=origin, cell_size=cell, dims=dims,
                     num_valid=jnp.asarray(num_points, jnp.int32))
    return DistGrid(grid, ok)
