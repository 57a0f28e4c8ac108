"""Cell-centric kNN: the fast path for all-points self-queries.

The query-centric kernel (knn.py) fetches 27·C candidate rows per QUERY
— on a 1M-point cloud that's ~1.8B gathered rows, and XLA gathers are
the dominant cost (~8 s/1M measured on v5e). But queries that share a
grid cell share their entire candidate set, so this kernel iterates
over OCCUPIED CELLS instead:

  per cell: fetch the 27-cell candidate neighborhood ONCE (as 9
  contiguous runs of 3 x-adjacent cells — contiguous in the sorted
  array because cell ids linearize x fastest), compute the distance
  matrix of the cell's own points vs the candidates as an MXU batched
  matmul in CELL-LOCAL coordinates (f32-safe), and top-k each row.

Gather volume drops by the mean cell occupancy (~38× for k=20) and the
searchsorted count drops 27 N → 18·n_cells. Exactness certification
(coverage radius, capacity overflow, cell-table overflow) is preserved.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pct_tpu.neighbors.grid import MAXDIM, PAD_ID, GridIndex
from pct_tpu.neighbors.knn import NeighborResult


class CellTable(NamedTuple):
    """Compaction of occupied cells (statically sized at max_cells)."""
    cell_id: jax.Array     # (MC,) linearized id, PAD_ID beyond num_cells
    start: jax.Array       # (MC,) first sorted-row of the cell
    count: jax.Array       # (MC,) points in the cell
    num_cells: jax.Array   # () int32
    overflow: jax.Array    # () bool — more occupied cells than MC
    max_count: jax.Array   # () int32 — fullest cell (for capacity tuning)


@partial(jax.jit, static_argnames=("max_cells",))
def compact_cells(grid: GridIndex, max_cells: int) -> CellTable:
    ids = grid.sorted_ids
    n = ids.shape[0]
    prev = jnp.concatenate([jnp.full((1,), -1, ids.dtype), ids[:-1]])
    is_first = (ids != prev) & (ids != PAD_ID)
    rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    num_valid = jnp.sum((ids != PAD_ID).astype(jnp.int32))
    num_cells = jnp.where(num_valid > 0, rank[n - 1] + 1, 0)
    # rank may exceed MC on pathological clouds -> drop + flag
    slot = jnp.where(is_first, rank, max_cells)
    start = jnp.full((max_cells,), n, jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    cell_id = jnp.full((max_cells,), PAD_ID, ids.dtype).at[slot].set(
        ids, mode="drop")
    nxt = jnp.concatenate([start[1:], jnp.full((1,), n, jnp.int32)])
    c = jnp.arange(max_cells, dtype=jnp.int32)
    end = jnp.where(c + 1 < num_cells, nxt, num_valid)
    count = jnp.where(c < num_cells, end - start, 0)
    return CellTable(cell_id, start, count, num_cells,
                     jnp.any(rank > max_cells - 1), jnp.max(count))


@partial(jax.jit, static_argnames=("cap", "factor"))
def split_cells(cells: CellTable, n: int, cap: int, factor: int) -> CellTable:
    """Virtual-split cells with count > ``cap`` into <= ``factor`` table
    rows of <= ``cap`` queries each (same cell_id, start offset by
    j·cap), so the per-bucket CAPACITY static never exceeds ``cap``.

    Mosaic's compile time for the cell-loop kernels blows up with the
    query-axis static (measured: the bunny's k=100 single bucket at
    capacity 272 never finished compiling; <= 128 compiles in seconds) —
    a cell's queries don't need to share a kernel row block, only its
    candidate runs do, and those are duplicated per virtual row.

    Correctness: consumers are row-wise. The runs table searches
    ``cell_id`` with side="left", so duplicate ids resolve to the first
    copy, whose ``start`` is the cell's true run boundary; per-query
    outputs scatter by ``qrow`` which stays disjoint across the virtual
    rows; the coverage certificate depends only on the (unchanged) cell
    coords. ``factor`` must be >= ceil(max_count / cap) — the probe that
    sized the bucket spec supplies it.
    """
    j = jnp.arange(factor, dtype=jnp.int32)
    cid = jnp.repeat(cells.cell_id, factor)        # adjacent copies: sorted
    start = (cells.start[:, None] + j[None, :] * cap).reshape(-1)
    count = jnp.clip(cells.count[:, None] - j[None, :] * cap, 0, cap
                     ).reshape(-1)
    valid = (cid != PAD_ID) & (count > 0)
    out_mc = cells.cell_id.shape[0] * factor
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    slot = jnp.where(valid, rank, out_mc)

    def sc(a, fill):
        return jnp.full((out_mc,), fill, a.dtype).at[slot].set(a, mode="drop")

    return CellTable(sc(cid, PAD_ID), sc(start, jnp.int32(n)), sc(count, 0),
                     jnp.sum(valid.astype(jnp.int32)), cells.overflow,
                     jnp.max(count))


def _decode(cell_id):
    ix = cell_id % MAXDIM
    iy = (cell_id // MAXDIM) % MAXDIM
    iz = cell_id // (MAXDIM * MAXDIM)
    return ix, iy, iz


def default_select_impl() -> str:
    """Pallas on real TPUs, XLA elsewhere (CPU tests use the XLA path;
    the Pallas kernel itself is tested via interpret mode)."""
    import jax

    return "pallas" if jax.default_backend() not in ("cpu",) else "xla"


def _cand_pack(n: int) -> int:
    """Points PACKED PER GATHERED ROW in the candidate fetch.

    The XLA row gather is ROW-COUNT-bound, not byte-bound (measured on
    v5e, scripts/micro_gather_pack.py: 43M 16B rows 735 ms; the same
    bytes as 6.3M 128B rows 66 ms — 11x). Candidates are contiguous
    3-cell x-runs, so 8 consecutive sorted points ride one (8·ch)-wide
    row: row count drops 8x for a ≤(pack) per-run-edge overfetch. The
    cloud padding (core.cloud: 1024-multiples) makes n % 8 == 0 the
    normal case; odd-sized grids fall back to per-point rows.

    PER-PATH trade-off (all measured, 1M torus, v5e): unpacking the
    gathered groups into the kernels' per-axis (T, M) lane layout is a
    sublane->lane relayout that costs ~0.8 s/1M — packing only wins
    where it replaces something even worse. The library-kNN rows path
    (with_ids: the unpacked alternative is a trailing-dim-4 (T,M,4)
    gather) went 0.662 -> 0.487 s and the k=100 moments engine (gather
    dominates the budget) 1.92 -> 1.67 s; but the k=20 fused coords
    path (cheap select kernel, trailing-dim-3 gather that XLA slices
    efficiently) went 0.626 -> 1.51 s. ``cellwise_tile_runner``
    therefore pins pack=1; the rows/moments paths take this default.
    """
    return 8 if n % 8 == 0 else 1


def _cand_m(cand_cap: int, pack: int) -> int:
    """Candidate-axis width M for a per-row slot budget ``cand_cap``.

    ``cand_cap`` is the pack-INDEPENDENT budget: the (8-aligned) maximum
    over cells of the summed 9-run length (probe_grid/_optimal_buckets).
    The dynamic run packing (see _tile_candidates) lays each run out
    from a pack-group boundary, so a run of length L with in-group
    offset o occupies ceil((o+L)/pack)·pack ≤ L + 2·(pack-1) slots —
    the budget widens by at most 9·(2·pack-2) alignment slack, rounded
    to whole groups."""
    if pack <= 1:
        return cand_cap
    m = cand_cap + 9 * (2 * pack - 2)
    return ((m + pack - 1) // pack) * pack


def _run_layout(rs, run_len, pack: int):
    """Dynamic run packing: contiguous group-aligned layout of the 9
    candidate runs along the M axis.

    rs/run_len: (..., 9) per-offset run starts and lengths (sorted rows).
    Returns (g0, off, Px, tot_g): per-run first source group and
    in-group offset, the EXCLUSIVE prefix of per-run group counts
    (..., 10), and the total group count (..., ). Replaces the old
    static per-run spans of 9·run_cap slots — the padding between a
    bucket's max run and each cell's actual runs (measured 1.8-2.1×
    query-candidate pair inflation on the 1M torus at k∈{20,100},
    scripts/pack_budget.py) never enters the gather or the kernels.
    """
    off = rs % pack if pack > 1 else jnp.zeros_like(rs)
    g0 = rs // pack if pack > 1 else rs
    grp = jnp.where(run_len > 0, (off + run_len + pack - 1) // pack, 0)
    incl = jnp.cumsum(grp, axis=-1)
    Px = jnp.concatenate(
        [jnp.zeros_like(incl[..., :1]), incl], axis=-1)      # (..., 10)
    return g0, off, Px, incl[..., -1]


def _budget_overflow(run_len, cand_cap: int):
    """(...,) bool: this cell's total candidate count exceeds the
    pack-1 budget (trailing candidates are then dropped — certificate
    void). PACK-FREE by design: _tile_candidates clips run lengths
    against the same budget before layout, so the retained candidate
    set — and therefore this flag — is identical at every pack (the
    alignment slack in _cand_m guarantees clipped runs always fit)."""
    return jnp.sum(run_len, axis=-1) > cand_cap


def _clip_runs(run_len, cand_cap: int):
    """Clip the 9 run lengths so their TOTAL fits the pack-1 budget:
    run i keeps min(len_i, max(0, cand_cap - Σ_{j<i} len_j)). Greedy
    front-to-back drop — deterministic and pack-independent."""
    excl = jnp.cumsum(run_len, axis=-1) - run_len
    return jnp.clip(cand_cap - excl, 0, run_len)


def _select_scoped_bytes(block: int, c: int, m: int, k: int) -> int:
    """Mosaic scoped-VMEM estimate for one select-kernel program.

    Dominant terms, matched against the round-4 in-the-wild OOM
    ("scoped allocation 21.51M" at block=8, C=192, M~1600, k=50 —
    this model gives 21.3M for that config):
      2 live (B,C,M) f32 copies (d2 + the iota/where temporary),
      4 double-buffered (B,M) candidate arrays,
      3+1 (B,C) query arrays, 2 double-buffered (B,C,k) outputs.
    """
    return (8 * block * c * m          # d2 + one (B,C,M) temp
            + 32 * block * m           # 4 x (B,M) in, double-buffered
            + 16 * block * c           # 4 x (B,C) query-side arrays
            + 16 * block * c * k)      # 2 x (B,C,k) out, double-buffered


_SELECT_VMEM_DEFAULT = 12 << 20   # keep 4 MB headroom under Mosaic's 16 MB
_SELECT_VMEM_RAISED = 64 << 20    # raised budget (v5e has 128 MB VMEM)
_SELECT_COMPILE_HAZARD = 48_000  # max k*M admitted to the unrolled-k
# select at k >= 32. Measured Mosaic compile walls for the k=50 class:
# (64,144,50)/M=4016 (kM 200k) — 34 min then scoped-VMEM OOM (CLAUDE.md
# round-4); (128,192,50)/M~1900 (kM 96k) — 32 min then OOM
# (sweep_r4_200k_perturbed.csv timestamps); (128,192,50)/M=1600 (kM
# 80k) with the raised vmem limit — >20 min compile reproduced round 5
# (scripts/probe_vmem_fix.py). The class is a compile-time sink
# regardless of the VMEM budget, so k>=32 selects above this cap demote
# to the XLA path (HBM distance expansion + top_k: fast to compile,
# moderate runtime). k < 32 (headline class) is exempt — it has never
# shown the pathology at any probed M.


def _select_plan(capacity: int, m: int, k: int):
    """(block_cells, vmem_limit_bytes|None) for the pallas select, or
    (None, None) when block=8 exceeds the raised budget (the caller
    must demote to the XLA path).

    block is ALWAYS 8: the select kernels' 2D blocks put block_cells on
    the SUBLANE axis, and Mosaic only lowers sublane block extents that
    are divisible by 8 or equal to the array dim — a sub-8 tier passed
    interpret-mode tests but failed TPU lowering in the wild
    (sweep_r5 r=1000 Perturbed voter selects, "block shape (1, 256)").
    Programs that fit the DEFAULT scoped budget get vmem_limit=None so
    their compiled artifacts stay byte-identical to pre-plan builds."""
    need = _select_scoped_bytes(8, capacity, m, k)
    if need <= _SELECT_VMEM_DEFAULT:
        return 8, None
    if need <= (_SELECT_VMEM_RAISED * 3) // 4:
        return 8, _SELECT_VMEM_RAISED
    return None, None


def pallas_select_ok(capacity: int, cand_cap: int, k: int,
                     pack: int = 1) -> bool:
    """Would the pallas select admit this (capacity, cand_cap, k) static?
    False when the working set overflows even at block=1 or the config
    falls in the Mosaic compile-hazard class (k >= 32 with huge k*M).
    Routing helper for pipeline-level engine choices (pipeline/fused.py).
    """
    m = _cand_m(cand_cap, pack)
    if k >= 32 and k * m > _SELECT_COMPILE_HAZARD:
        return False
    return _select_plan(capacity, m, k)[0] is not None


def _working_set_guards(capacity: int, tile_cells: int, cand_cap: int,
                        select_impl: str, demote_pallas: bool = True,
                        pack: int = 1, k: int | None = None):
    """VMEM/HBM working-set guards (large k => capacity up to 256,
    M in the thousands). Returns (tile_cells, select_impl), possibly
    reduced. ``demote_pallas=False`` skips the pallas->xla fallback (the
    moment kernel manages its own VMEM via an int32 scratch + chunked
    passes; ``k`` only participates in the select-kernel plan).
    """
    m_width = _cand_m(cand_cap, pack)
    # pallas select holds ~2 (block, capacity, M) f32 copies plus the
    # (block, capacity, k) outputs in scoped VMEM; demote to XLA when no
    # (block_cells, vmem_limit) fits, or when the static falls in the
    # Mosaic compile-hazard class. _tile_select recomputes the same plan
    # to pick the actual block size / limit.
    if (demote_pallas and select_impl == "pallas"
            and not pallas_select_ok(capacity, cand_cap, k or 0, pack)):
        select_impl = "xla"
    # XLA path materializes (tile, capacity, M) distance tensors in HBM;
    # shrink the tile so that stays <= ~256 MB
    max_tile = max(8, (1 << 28) // max(capacity * m_width * 4, 1))
    while tile_cells > max_tile and tile_cells > 8:
        tile_cells //= 2
    return tile_cells, select_impl


DENSE_CELLS = 1 << 23    # dense boundary-map budget (32 MB int32): grids
# whose bbox holds more cell boxes fall back to the sort-based search


def _runs_table(grid: GridIndex, cells: CellTable,
                cid: jax.Array | None = None):
    """Candidate-run table for all cells — search-free on typical grids.

    A run boundary is the start row of the first OCCUPIED cell at/past a
    wanted id. When the grid's total cell-box count fits ``DENSE_CELLS``
    this is a direct lookup: scatter each occupied cell's start row into
    a dense table over COMPRESSED cell keys (x + dims0·(y + dims1·z) —
    same ordering as the linearized ids, so start rows are monotone in
    key), reverse-cummin to fill empty boxes with the next occupied
    cell's start, then answer every boundary with one gather. No sort,
    no binary search. Oversized grids take ONE sort-based searchsorted
    over the compact table (~N/occupancy keys; a ``lax.cond`` picks the
    branch at runtime since dims are data-dependent under jit).

    If the table overflowed (num_cells > MC) some runs can shrink; the
    global overflow flag already voids exactness then.

    cid: (MC,) linearized cell ids whose runs are wanted (defaults to
    the table's own cells; PAD_ID rows get zero-length runs).
    Returns (rs (MC,9) int32 run starts, run_len (MC,9) int32 UNCLIPPED).
    """
    n = grid.sorted_points.shape[0]
    if cid is None:
        cid = cells.cell_id
    dims = grid.dims
    ix_a, iy_a, iz_a = _decode(jnp.where(cid == PAD_ID, 0, cid))
    dyz = jnp.array([(dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)],
                    dtype=jnp.int32)                           # (9, 2)
    ny_a = iy_a[:, None] + dyz[None, :, 0]
    nz_a = iz_a[:, None] + dyz[None, :, 1]
    ok_run_a = ((ny_a >= 0) & (ny_a < dims[1]) & (nz_a >= 0)
                & (nz_a < dims[2]) & (cid != PAD_ID)[:, None])
    x_lo = jnp.maximum(ix_a - 1, 0)[:, None]
    x_hi = jnp.minimum(ix_a + 1, dims[0] - 1)[:, None]
    # PAD table rows carry start=n (the PADDED capacity) — as a run
    # BOUNDARY that would extend runs into the padding rows (zero
    # coordinates!), so boundaries clamp to num_valid instead
    nv = grid.num_valid
    total = dims[0] * dims[1] * dims[2]
    # static table size: grids with more boxes than ~4·n are so sparse
    # the sort path loses nothing (n is the padded cloud size, so this
    # is a shape-derived STATIC; small test clouds get small tables; the
    # 1M torus needs 2.52M boxes -> 2^22, and 2^22 measured 5 ms faster
    # than 2^23 — scripts/micro_runs.py)
    dense_cap = min(DENSE_CELLS, 1 << (4 * n - 1).bit_length())

    def dense_lookup(_):
        kix, kiy, kiz = _decode(jnp.where(cells.cell_id == PAD_ID, 0,
                                          cells.cell_id))
        ckey = kix + dims[0] * (kiy + dims[1] * kiz)
        valid = cells.cell_id != PAD_ID
        table = jnp.full((dense_cap,), 1, jnp.int32) * nv
        # scatter-MIN, not set: split_cells leaves DUPLICATE cell ids in
        # the table (virtual copies, start offset by j·cap) and the run
        # boundary must be the FIRST copy's start — the sort branch gets
        # this from side="left"
        table = table.at[jnp.where(valid, ckey, dense_cap)].min(
            cells.start, mode="drop")
        # start rows are monotone in ckey -> suffix-min = "start of the
        # first occupied cell at-or-after this box"
        table = jax.lax.cummin(table, axis=0, reverse=True)
        row = dims[0] * (ny_a + dims[1] * nz_a)                # (MC, 9)
        q_lo = row + x_lo
        q_hi1 = row + x_hi + 1
        rs = table[jnp.clip(q_lo, 0, dense_cap - 1)]
        re = table[jnp.clip(q_hi1, 0, dense_cap - 1)]
        # a query one-past the LAST box clamps onto an occupied slot:
        # its true boundary is the end of the valid rows
        re = jnp.where(q_hi1 >= total, nv, re)
        rs = jnp.where(ok_run_a, rs, 0)
        re = jnp.where(ok_run_a, re, 0)
        return rs, re

    def sorted_search(_):
        base_a = ny_a * MAXDIM + nz_a * MAXDIM * MAXDIM        # (MC, 9)
        run_lo_a = base_a + x_lo
        run_hi_a = base_a + x_hi
        start_ext = jnp.concatenate(
            [jnp.where(cells.cell_id == PAD_ID, nv, cells.start),
             jnp.full((1,), 1, jnp.int32) * nv])
        # ONE sort-based searchsorted for both boundaries (each
        # method="sort" call pays a full concat+sort of keys+queries)
        c_both = jnp.searchsorted(
            cells.cell_id,
            jnp.concatenate([run_lo_a, run_hi_a + 1], axis=1),
            side="left", method="sort")
        return start_ext[c_both[:, :9]], start_ext[c_both[:, 9:]]

    rs_a, re_a = jax.lax.cond(total <= dense_cap, dense_lookup,
                              sorted_search, None)
    run_len_a = jnp.where(ok_run_a, re_a - rs_a, 0)
    return rs_a, run_len_a


def _cellwise_setup(grid: GridIndex, cells: CellTable, capacity: int,
                    tile_cells: int, cand_cap: int, select_impl: str,
                    demote_pallas: bool = True, pack: int | None = None,
                    k: int | None = None):
    """Shared prologue for the single-bucket cell loop: working-set
    guards + runs table + tile padding. ``pack`` must match the pack the
    caller's tile body will fetch candidates with (the guards size M
    from it); default is the packed fetch.

    Returns (tile_args, tile_cells, select_impl) where tile_args are the
    per-tile arrays reshaped to (num_tiles, tile_cells, ...).
    """
    n = grid.sorted_points.shape[0]
    mc = cells.cell_id.shape[0]
    pack = _cand_pack(n) if pack is None else pack
    tile_cells, select_impl = _working_set_guards(
        capacity, tile_cells, cand_cap, select_impl, demote_pallas,
        pack=pack, k=k)
    pad_tiles = (-mc) % tile_cells

    cid = jnp.pad(cells.cell_id, (0, pad_tiles), constant_values=PAD_ID)
    cstart = jnp.pad(cells.start, (0, pad_tiles), constant_values=n)
    ccount = jnp.pad(cells.count, (0, pad_tiles))

    rs_a, run_len_a = _runs_table(grid, cells, cid)
    overflow_a = _budget_overflow(run_len_a, cand_cap)         # (MC,)

    tile_args = (cid.reshape(-1, tile_cells), cstart.reshape(-1, tile_cells),
                 ccount.reshape(-1, tile_cells),
                 rs_a.reshape(-1, tile_cells, 9),
                 run_len_a.reshape(-1, tile_cells, 9),
                 overflow_a.reshape(-1, tile_cells))
    return tile_args, tile_cells, select_impl


def _tile_candidates(grid: GridIndex, args, capacity: int, cand_cap: int,
                     with_ids: bool = False, pack: int | None = None):
    """Candidate fetch + coverage radius for one tile of the cell loop.

    Returns (cand (T,M) sorted rows, ok_cand (T,M), cpts per-axis
    3-tuple of (T,M) arrays, qpts (T,C,3), qrow (T,C), ok_q (T,C),
    cover (T,C) guaranteed coverage radius, run_overflow (T,),
    coords (T,3) cell coords), with M = ``_cand_m(cand_cap, pack)``.
    Candidate coordinates come back as SEPARATE per-axis 2D arrays —
    the select/moment kernels consume exactly that layout, and a packed
    (T,M,3) intermediate would tile its trailing 3 onto 128 lanes (42×
    padded traffic; measured 1.5 s/1M in the reshape alone).

    DYNAMIC RUN PACKING: the 9 candidate runs are laid out contiguously
    along the M axis at computed per-run offsets (group-prefix sums,
    ``_run_layout``) instead of static 9×run_cap spans — M tracks each
    bucket's max TOTAL candidate count, which on typical density
    spreads is ~2× tighter than 9× its max run (scripts/pack_budget.py:
    0.74→0.36 G pairs at 1M k=20, 2.95→1.61 G at k=100). The M-axis
    candidate ORDER is preserved (runs in offset order, ascending rows
    within a run; group-alignment slack rides along masked invalid), so
    winner sets AND first-argmin tie order are identical to the static
    layout. Cells whose packed runs exceed the budget drop trailing
    candidates (deterministically) and must be flagged by the caller
    via ``_budget_overflow`` — certificate void, repair path.

    ``pack`` (default ``_cand_pack(n)``): candidates are fetched
    ``pack`` consecutive sorted points per gathered row — the gather is
    row-count-bound on TPU (see ``_cand_pack``) — each run starting at
    a pack-group boundary.

    ``with_ids``: ``cand`` carries the candidates' ORIGINAL point ids
    instead of sorted rows, fetched in the SAME row gather as the
    coordinates (grid.order rides as a 4th float channel). The separate
    per-winner `grid.order[rows]` gather — (N,k) random elements,
    measured 0.9 s/1M vs +0.05 s for the wider rows here — never
    happens. Self-exclusion against original ids is equivalent (ids are
    unique). The id channel is a NUMERIC f32 cast, exact for ids < 2^24
    — a bitcast would put small ids in the denormal range, which TPU
    vector ops flush to zero (measured: corrupted winners); clouds
    beyond 2^24 rows take the plain per-winner gather instead (callers
    guard).
    """
    n = grid.sorted_points.shape[0]
    dims = grid.dims
    inf = jnp.float32(jnp.inf)
    cell_id, start, count, rs, run_len, run_overflow = args   # (T, ...)
    T = cell_id.shape[0]
    ix, iy, iz = _decode(jnp.where(cell_id == PAD_ID, 0, cell_id))
    if pack is None:
        pack = _cand_pack(n)
    p = pack
    m_axis = _cand_m(cand_cap, p)
    mg = m_axis // p
    qrow = jnp.minimum(start[:, None] + jnp.arange(capacity,
                                                   dtype=jnp.int32), n - 1)
    ok_q = jnp.arange(capacity, dtype=jnp.int32)[None, :] < count[:, None]

    # --- computed gather indices for the packed-run layout ---
    # clip runs against the PACK-1 budget first: overflowing cells then
    # retain the same candidate set at every pack (see _budget_overflow)
    run_len = _clip_runs(run_len, cand_cap)
    g0, off, Px, tot_g = _run_layout(rs, run_len, p)          # (T,9),(T,10)
    j = jnp.arange(mg, dtype=jnp.int32)
    # run of each output group: #runs whose exclusive prefix <= j
    rj = jnp.sum((j[None, None, :] >= Px[:, 1:10, None]).astype(jnp.int32),
                 axis=1)                                      # (T,mg) 0..8

    def sel9(a):                                              # (T,9)->(T,mg)
        acc = None
        for r in range(9):
            t = jnp.where(rj == r, a[:, r:r + 1], 0)
            acc = t if acc is None else acc + t
        return acc

    g0j, pj, offj, lenj = sel9(g0), sel9(Px[:, :9]), sel9(off), sel9(run_len)
    ok_g = j[None, :] < tot_g[:, None]                        # (T, mg)
    grow = jnp.clip(g0j + (j[None, :] - pj), 0, n // p - 1)   # (T, mg)
    u = jnp.arange(p, dtype=jnp.int32)
    s_in = ((j[None, :, None] - pj[..., None]) * p
            + u[None, None, :] - offj[..., None])             # (T, mg, p)
    ok_cand = (ok_g[..., None] & (s_in >= 0)
               & (s_in < lenj[..., None])).reshape(T, m_axis)

    if p > 1:
        # --- packed fetch: p consecutive points per gathered row,
        # channels GROUPED BY AXIS ([x·p | y·p | z·p | id·p]) so each
        # axis extracts as one contiguous lane slice into a clean 2D
        # (T, M) array — never materializing a trailing-3 tensor ---
        ch = 4 if with_ids else 3
        cols = [grid.sorted_points]
        if with_ids:
            cols.append(grid.order.astype(jnp.float32)[:, None])
        table = jnp.concatenate(cols, axis=1) if with_ids else cols[0]
        table = table.reshape(n // p, p, ch).transpose(0, 2, 1)
        table = table.reshape(n // p, ch * p)
        g = table[grow]                                      # (T, mg, ch·p)

        def lane(a):
            return g[..., a * p:(a + 1) * p].reshape(T, m_axis)

        cpts = (lane(0), lane(1), lane(2))
        if with_ids:
            cand = lane(3).astype(jnp.int32)
            qrow_out = grid.order[qrow]                      # (T, C): ~n/occ
        else:
            cand = (grow[..., None] * p
                    + u[None, None, :]).reshape(T, m_axis)
            qrow_out = qrow
        qpts = grid.sorted_points[qrow]
    else:
        cand = grow                                          # (T, M) rows
        if with_ids:
            packed = jnp.concatenate(
                [grid.sorted_points,
                 grid.order.astype(jnp.float32)[:, None]], axis=1)   # (n, 4)
            g = packed[cand]                                 # (T, M, 4)
            cpts = (g[..., 0], g[..., 1], g[..., 2])
            cand = g[..., 3].astype(jnp.int32)
            qpts = grid.sorted_points[qrow]
            qrow_out = grid.order[qrow]                      # (T, C): ~n/occ
        else:
            g = grid.sorted_points[cand]                     # (T, M, 3)
            cpts = (g[..., 0], g[..., 1], g[..., 2])
            qpts = grid.sorted_points[qrow]                  # (T, C, 3)
            qrow_out = qrow
    # --- per-query coverage radius within the 3³ window ---
    coords = jnp.stack([ix, iy, iz], axis=-1)                # (T, 3)
    lo_edge = grid.origin[None, :] + (coords - 1).astype(jnp.float32) \
        * grid.cell_size
    hi_edge = grid.origin[None, :] + (coords + 2).astype(jnp.float32) \
        * grid.cell_size
    left = jnp.where((coords - 1 <= 0)[:, None, :], inf,
                     qpts - lo_edge[:, None, :])
    right = jnp.where((coords + 1 >= dims - 1)[:, None, :], inf,
                      hi_edge[:, None, :] - qpts)
    cover = jnp.minimum(jnp.min(left, axis=-1), jnp.min(right, axis=-1))
    return (cand, ok_cand, cpts, qpts, qrow_out, ok_q, cover, run_overflow,
            coords)


def _tile_select(grid: GridIndex, args, k: int, capacity: int, cand_cap: int,
                 select_impl: str, want: str = "pos",
                 with_ids: bool = False, pack: int | None = None):
    """One tile of the cell loop: candidate fetch + fused k-selection.

    Returns (win, dists (T,C,k) ascending, found (T,C,k), cand (T,M)
    candidate sorted rows, cpts per-axis 3-tuple of (T,M) candidate
    coords, qpts (T,C,3), qrow (T,C), ok_q (T,C) real-query mask,
    exact (T,C) coverage certificate), where ``win`` depends on
    ``want``:

    - "pos":    (T,C,k) winner positions in the M candidate axis
    - "rows":   (T,C,k) winner GLOBAL sorted-row ids (== cand[pos]);
                with ``with_ids`` these are ORIGINAL point ids, fetched
                inside the candidate row gather (see _tile_candidates)
    - "coords": (T,C,k,3) winner coordinates (== cpts[pos])

    For "rows"/"coords" the pallas path extracts the values inside the
    kernel (ops.pallas_select.knn_select_rows / knn_select_coords — the
    (T,C,k) winner gather, ~0.2s/1M on v5e, never happens); the XLA
    path gathers tile-locally. Both paths pick identical winners
    (first-argmin tie order) under identical distance math.
    """
    inf = jnp.float32(jnp.inf)
    cand, ok_cand, cpts, qpts, qrow, ok_q, cover, run_overflow, coords = \
        _tile_candidates(grid, args, capacity, cand_cap, with_ids=with_ids,
                         pack=pack)
    # degenerate tiny clouds: the packed M axis can fall below k (the
    # old static 9·run_cap layout never did) — top_k and the select
    # kernels need >= k slots; pad with invalid candidates
    k8 = ((k + 7) // 8) * 8
    if cand.shape[1] < k8:
        padm = k8 - cand.shape[1]
        cand = jnp.pad(cand, ((0, 0), (0, padm)))
        ok_cand = jnp.pad(ok_cand, ((0, 0), (0, padm)))
        cpts = tuple(jnp.pad(a, ((0, 0), (0, padm))) for a in cpts)
    T = cand.shape[0]
    pos = None
    win = None
    if select_impl == "pallas" or select_impl == "pallas_interpret":
        interpret = select_impl == "pallas_interpret"
        ok_i = ok_cand.astype(jnp.int32)
        # scoped-VMEM plan for THIS static: shrink block_cells / raise the
        # Mosaic budget when the working set overflows the 16 MB default
        # (round-4 in-the-wild OOM: (tile,192,50) k=50 select on perturbed
        # clouds). The guards already demoted configs with no plan.
        block, vmem_limit = _select_plan(capacity, cand.shape[1], k)
        if block is None:      # unguarded direct caller: fail safe
            # (guarded paths demote to XLA before reaching here; block
            # must stay 8 — sub-8 sublane blocks do not lower)
            block, vmem_limit = 8, _SELECT_VMEM_RAISED
        if want == "coords":
            from pct_tpu.ops.pallas_select import knn_select_coords

            dists, win = knn_select_coords(qpts, cpts, cand, qrow, ok_i, k,
                                           block_cells=block,
                                           interpret=interpret,
                                           vmem_limit=vmem_limit)
        elif want == "rows":
            from pct_tpu.ops.pallas_select import knn_select_rows

            dists, win = knn_select_rows(qpts, cpts, cand, qrow, ok_i, k,
                                         block_cells=block,
                                         interpret=interpret,
                                         vmem_limit=vmem_limit)
        else:
            from pct_tpu.ops.pallas_select import knn_select

            dists, pos = knn_select(qpts, cpts, cand, qrow, ok_i, k,
                                    block_cells=block, interpret=interpret,
                                    vmem_limit=vmem_limit)
        found = dists < 1e18     # kernel backs missing slots with ~3e38
    else:
        # --- XLA path: MXU distance expansion in cell-local coords ---
        cpts3 = jnp.stack(cpts, axis=-1)                     # (T, M, 3)
        corner = grid.origin[None, :] + grid.cell_size \
            * coords.astype(jnp.float32)                     # (T, 3)
        cpts_l = cpts3 - corner[:, None, :]
        qpts_l = qpts - corner[:, None, :]
        q2 = jnp.sum(qpts_l * qpts_l, axis=-1)               # (T, C)
        c2 = jnp.sum(cpts_l * cpts_l, axis=-1)               # (T, M)
        cross = jnp.einsum("tcd,tmd->tcm", qpts_l, cpts_l,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(q2[:, :, None] + c2[:, None, :] - 2.0 * cross,
                         0.0)
        d2 = jnp.where(ok_cand[:, None, :], d2, inf)
        # self-exclusion: candidate sorted-pos == query sorted-pos
        self_m = cand[:, None, :] == qrow[:, :, None]
        d2 = jnp.where(self_m, inf, d2)
        neg, pos = jax.lax.top_k(-d2, k)                     # (T, C, k)
        dists = jnp.sqrt(jnp.maximum(-neg, 0.0))
        found = jnp.isfinite(neg)
    # --- exactness: kth distance inside the certified coverage radius ---
    exact = (found[..., k - 1] & (dists[..., k - 1] <= cover)
             & (~run_overflow[:, None]))
    if win is None and want != "pos":
        if want == "coords":
            win = jnp.take_along_axis(
                jnp.stack(cpts, axis=-1),
                pos.reshape(T, -1)[:, :, None], axis=1
            ).reshape(T, capacity, k, 3)
        else:  # rows
            t_ix = jnp.arange(T, dtype=jnp.int32)[:, None, None]
            win = cand[t_ix, pos]
    if want != "pos":
        return win, dists, found, cand, cpts, qpts, qrow, ok_q, exact
    return pos, dists, found, cand, cpts, qpts, qrow, ok_q, exact


@partial(jax.jit, static_argnames=("k", "capacity", "tile_cells", "cand_cap",
                                   "original_ids", "lean", "select_impl"))
def knn_cellwise(
    grid: GridIndex,
    cells: CellTable,
    k: int,
    capacity: int = 64,
    tile_cells: int = 128,
    cand_cap: int | None = None,
    original_ids: bool = True,
    lean: bool = False,
    select_impl: str | None = None,
) -> NeighborResult:
    """Self-excluded kNN for every point, rows in SORTED order.

    ``indices`` are original point ids (grid.order applied) when
    ``original_ids``; otherwise SORTED-space row ids (skips an 84M-element
    gather — the fused pipeline gathers neighborhoods from sorted_points
    directly). A row's query is grid.sorted_points[row]. ``capacity`` is
    the max points considered per cell; ``cand_cap`` budgets the TOTAL
    packed candidate slots per cell (default 27·capacity — the full 3³
    window at max occupancy; probe_grid supplies the exact maximum).
    """
    if select_impl is None:
        select_impl = default_select_impl()
    n = grid.sorted_points.shape[0]
    if cand_cap is None:
        cand_cap = 27 * capacity
    tile_args, tile_cells, select_impl = _cellwise_setup(
        grid, cells, capacity, tile_cells, cand_cap, select_impl, k=k)

    use_ids = original_ids and n < (1 << 24)   # f32-exact id range

    def one_tile(args):
        # with_ids: winners come out as ORIGINAL ids straight from the
        # packed candidate gather — the (N,k) grid.order[rows] gather
        # (measured 0.9 s/1M) never happens
        rows, dists, found, _, _, _, qrow, ok_q, exact = _tile_select(
            grid, args, k, capacity, cand_cap, select_impl, want="rows",
            with_ids=use_ids)
        del found      # validity is re-derived from the distances below
        if original_ids and not use_ids:
            rows = grid.order[rows]
        return rows, dists, exact & ok_q

    idx, dists, exact = jax.lax.map(one_tile, tile_args)

    flat = lambda a: a.reshape((-1,) + a.shape[3:])
    idx, dists = flat(idx), flat(dists)
    exact = flat(exact)
    # reorder (cell,slot) results to sorted-row order with a GATHER, not
    # a scatter (XLA scatter on TPU costs ~1s/1M×k=20 rows; the inverse
    # map is computable per row): row r lives in occupied-cell rank b_r
    # at slot r - start[b_r], i.e. flat source row b_r·capacity + slot.
    ids = grid.sorted_ids
    prev = jnp.concatenate([jnp.full((1,), -1, ids.dtype), ids[:-1]])
    is_first = (ids != prev) & (ids != PAD_ID)
    rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1          # (n,)
    mc_total = cells.cell_id.shape[0]
    rank_c = jnp.minimum(rank, mc_total - 1)
    slot_r = jnp.arange(n, dtype=jnp.int32) - cells.start[rank_c]
    covered = ((ids != PAD_ID) & (rank < mc_total)
               & (slot_r >= 0) & (slot_r < capacity))
    src = jnp.where(covered, rank_c * capacity
                    + jnp.clip(slot_r, 0, capacity - 1), 0)
    out_idx = jnp.where(covered[:, None], idx[src], 0)
    out_e = covered & exact[src] & (~cells.overflow)
    if lean:
        # the fused pipeline only needs indices + kth distance
        kth = jnp.where(covered, dists[src, k - 1], 0.0)
        return NeighborResult(out_idx, kth[:, None], None, out_e)
    d_src = dists[src]
    out_d = jnp.where(covered[:, None], d_src, 0.0)
    # derive validity from the distance instead of gathering `found`
    # (missing slots carry inf on the XLA path / ~1.7e19 on the pallas
    # path) — one full (N,k) gather fewer in the lean=False epilogue
    out_f = covered[:, None] & (d_src < 1e18)
    return NeighborResult(out_idx, out_d, out_f, out_e)


@partial(jax.jit, static_argnames=("k", "tile_cells", "original_ids", "lean",
                                   "select_impl", "bucket_spec"))
def knn_cellwise_bucketed(
    grid: GridIndex,
    cells: CellTable,
    k: int,
    bucket_spec: tuple,
    tile_cells: int = 128,
    original_ids: bool = True,
    lean: bool = False,
    select_impl: str | None = None,
) -> NeighborResult:
    """``knn_cellwise`` over occupancy-bucketed cells (library kNN fast
    path): each bucket runs the rows-emitting select kernel with its own
    (capacity, cand_cap) statics, so select/gather padding tracks each
    cell's actual size instead of the global maximum — the same lever
    that makes the fused curvature path fast. The final reorder stays a
    GATHER (TPU scatter of (N,k) rows costs ~1 s/1M): each sorted row
    computes its source as bucket-offset + member-rank·capacity + slot.
    """
    if select_impl is None:
        select_impl = default_select_impl()
    n = grid.sorted_points.shape[0]
    mc_total = cells.cell_id.shape[0]

    idxs, dsts, exacts = [], [], []
    padded_cells = []          # per bucket: cells incl. tile padding (static)
    for sp, tile_args, impl_b in bucketed_tile_args(
            grid, cells, bucket_spec, tile_cells, select_impl, k=k):

        use_ids = original_ids and n < (1 << 24)   # f32-exact id range

        def one_tile(args, sp=sp, impl_b=impl_b, use_ids=use_ids):
            # with_ids: original ids from the packed candidate gather —
            # no (N,k) grid.order[rows] gather (measured 0.9 s/1M)
            rows, dists, found, _, _, _, qrow, ok_q, exact = _tile_select(
                grid, args, k, sp.capacity, sp.cand_cap, impl_b, want="rows",
                with_ids=use_ids)
            del found  # validity is re-derived from the distances below
            if original_ids and not use_ids:
                rows = grid.order[rows]
            return rows, dists, exact & ok_q

        idx_b, d_b, e_b = jax.lax.map(one_tile, tile_args)
        padded_cells.append(idx_b.shape[0] * idx_b.shape[1])
        flat = lambda a: a.reshape((-1,) + a.shape[3:])
        idxs.append(flat(idx_b))
        dsts.append(flat(d_b))
        exacts.append(flat(e_b))

    # --- per-cell source map: bucket membership replayed exactly as
    # _bucket_tables partitions (same key, same thresholds, same rank) ---
    _, run_len_a = _runs_table(grid, cells)
    tot = jnp.sum(run_len_a, axis=1)
    key = jnp.maximum(cells.count, (tot + 26) // 27)
    valid = cells.cell_id != PAD_ID
    nb = len(bucket_spec)
    cell_base = jnp.zeros((mc_total,), jnp.int32)
    cell_cap = jnp.zeros((mc_total,), jnp.int32)
    cell_in = jnp.zeros((mc_total,), bool)
    lo = 0
    off = 0
    for b, sp in enumerate(bucket_spec):
        member = valid & (key > lo)
        if b < nb - 1:
            member = member & (key <= sp.hi_key)
        rank_b = jnp.cumsum(member.astype(jnp.int32)) - 1
        inside = member & (rank_b < sp.max_cells)
        cell_base = jnp.where(inside, off + rank_b * sp.capacity, cell_base)
        cell_cap = jnp.where(inside, sp.capacity, cell_cap)
        cell_in = cell_in | inside
        lo = sp.hi_key
        off += padded_cells[b] * sp.capacity

    # --- per-row gather reorder (see knn_cellwise epilogue) ---
    ids = grid.sorted_ids
    prev = jnp.concatenate([jnp.full((1,), -1, ids.dtype), ids[:-1]])
    is_first = (ids != prev) & (ids != PAD_ID)
    rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1          # (n,)
    rank_c = jnp.minimum(rank, mc_total - 1)
    slot_r = jnp.arange(n, dtype=jnp.int32) - cells.start[rank_c]
    covered = ((ids != PAD_ID) & (rank < mc_total) & cell_in[rank_c]
               & (slot_r >= 0) & (slot_r < cell_cap[rank_c]))
    src = jnp.where(covered, cell_base[rank_c] + slot_r, 0)

    idx_all = jnp.concatenate(idxs)
    d_all = jnp.concatenate(dsts)
    e_all = jnp.concatenate(exacts)
    out_idx = jnp.where(covered[:, None], idx_all[src], 0)
    out_e = covered & e_all[src] & (~cells.overflow)
    if lean:
        kth = jnp.where(covered, d_all[src, k - 1], 0.0)
        return NeighborResult(out_idx, kth[:, None], None, out_e)
    d_src = d_all[src]
    out_d = jnp.where(covered[:, None], d_src, 0.0)
    out_f = covered[:, None] & (d_src < 1e18)
    return NeighborResult(out_idx, out_d, out_f, out_e)


def moments_tile_runner(grid: GridIndex, k: int, capacity: int, cand_cap: int,
                        select_impl: str, fn=None):
    """Large-k tile body: moment accumulation instead of top-k selection.

    Same (one_tile) contract as ``cellwise_tile_runner`` but the
    neighborhoods are never materialized — the Pallas moment kernel
    (ops/pallas_moments.py) reduces each query's k nearest to 35
    monomial sums; the tile OUTPUT is the raw (tc, C, NOUT) stats slab,
    and the caller runs ``fit.moments.curvature_from_moments`` ONCE over
    the flat scattered array (the ~5k-op symbolic moment rotation inside
    every per-bucket lax.map body made the 1M XLA compile pathological).
    ``fn`` is ignored (the curvature chain is fixed — only the explicit
    method exists in moment form); O(32·M) count passes replace O(k·M)
    argmin rounds.
    """
    del fn
    from pct_tpu.ops.pallas_moments import knn_moments, xla_moment_stats

    def one_tile(args):
        cand, ok_cand, cpts, qpts, qrow, ok_q, cover, run_overflow, _ = \
            _tile_candidates(grid, args, capacity, cand_cap)
        ok_i = ok_cand.astype(jnp.int32)
        if select_impl in ("pallas", "pallas_interpret"):
            stats = knn_moments(qpts, cpts, cand, qrow, ok_i, k,
                                interpret=select_impl == "pallas_interpret")
        else:
            stats = xla_moment_stats(qpts, cpts, cand, qrow, ok_i, k)
        sigma = stats[..., 38]
        found = stats[..., 45] > 0.0
        exact = found & (sigma <= cover) & (~run_overflow[:, None]) & ok_q
        return stats, exact, sigma, qrow, ok_q

    return one_tile


def _is_moments_runner(runner) -> bool:
    return runner is moments_tile_runner


def cellwise_tile_runner(grid: GridIndex, k: int, capacity: int, cand_cap: int,
                         select_impl: str, fn):
    """One-tile body of the fused cell loop, shared by ``apply_cellwise``
    and the distributed layer (which shards the tile axis over a device
    mesh — identical per-tile compute is what makes the sharded and
    single-chip results bit-identical).

    Returns ``one_tile(args) -> (fn outputs (tc,C,...), exact (tc,C),
    kth (tc,C), qrow (tc,C), ok_q (tc,C))``.
    """
    def one_tile(args):
        # pack=1: on this path the packed fetch LOSES — the select kernel
        # is cheap here and the per-axis unpack relayout dominates
        # (measured 0.626 -> 1.51 s/1M at k=20; see _cand_pack)
        nbrs, dists, found, _, _, qpts, qrow, ok_q, exact = _tile_select(
            grid, args, k, capacity, cand_cap, select_impl, want="coords",
            pack=1)
        centered = nbrs - qpts[:, :, None, :]
        out = fn(centered, found)
        return out, exact & ok_q, dists[..., k - 1], qrow, ok_q

    return one_tile


def apply_cellwise(
    grid: GridIndex,
    cells: CellTable,
    k: int,
    fn,
    capacity: int = 64,
    tile_cells: int = 128,
    cand_cap: int | None = None,
    select_impl: str | None = None,
    dest_order: str = "original",
    runner=None,
    post_fn=None,
    scatter_strategy: str = "invert",
):
    """Run ``fn`` over every point's kNN neighborhood INSIDE the cell loop.

    ``fn(centered (T,C,k,3), found (T,C,k)) -> pytree of (T,C,...)`` is
    traced into each tile: neighborhoods are gathered tile-locally from
    the candidate set already in flight (``cpts[pos]``), so the (N,k)
    index scatter, the global (N·k,3) neighborhood re-gather, and the
    final unsort pass of the two-stage pipeline never materialize. Only
    ``fn``'s per-query outputs are scattered to (n, ...) — in the
    caller's original point order (``dest_order="original"``) or sorted
    order ("sorted"). Padding slots and uncovered rows stay zero.

    ``post_fn(flat out pytree) -> pytree`` (optional) maps the per-query
    outputs row-for-row BEFORE the final scatter, in tile (padded,
    cell-sorted) row order. Any permutation-equivariant epilogue belongs
    here: the row scatter costs one HBM pass per packed COLUMN, so
    reducing a wide intermediate (the 48-lane moment stats) to its
    narrow final form first is much cheaper than scattering the wide
    form and post-processing in destination order (measured ~250 ms for
    the 50-column scatter at 1M k=100 vs ~60 ms for 11 columns).

    Returns (outputs pytree of (n, ...), exact (n,), kth_dist (n,)).
    NOT jitted itself — call under jit (``fn`` closures hash poorly as
    static args, so jitting is left to the caller).
    """
    if runner is None:
        runner = cellwise_tile_runner
    if select_impl is None:
        select_impl = default_select_impl()
    n = grid.sorted_points.shape[0]
    if cand_cap is None:
        cand_cap = 27 * capacity
    tile_args, tile_cells, select_impl = _cellwise_setup(
        grid, cells, capacity, tile_cells, cand_cap, select_impl,
        demote_pallas=runner is cellwise_tile_runner,
        pack=1 if runner is cellwise_tile_runner else None, k=k)

    one_tile = runner(grid, k, capacity, cand_cap, select_impl, fn)
    if _is_moments_runner(runner) and select_impl == "pallas":
        # the moment kernel's grid axis IS the cell axis: one pallas
        # call over every cell instead of lax.map over tiles — a pallas
        # custom-call inside a mapped while-loop at 1M scale never
        # finished XLA compilation (>58 min, twice). The XLA fallback
        # keeps the map: it materializes (tile, C, M) distance tensors
        # and must stay tiled.
        cell_args = jax.tree_util.tree_map(
            lambda a: a.reshape((-1,) + a.shape[2:]), tile_args)
        out, exact, kth, qrow, ok_q = one_tile(cell_args)
        flat = lambda a: a.reshape((-1,) + a.shape[2:])
    else:
        out, exact, kth, qrow, ok_q = jax.lax.map(one_tile, tile_args)
        flat = lambda a: a.reshape((-1,) + a.shape[3:])
    exact, kth = flat(exact), flat(kth)
    qrow, ok_q = flat(qrow), flat(ok_q)
    dest_rows = grid.order[qrow] if dest_order == "original" else qrow
    dest = jnp.where(ok_q, dest_rows, n)
    out = jax.tree_util.tree_map(flat, out)
    return _move_outputs(n, dest, out, exact & (~cells.overflow), kth,
                         post_fn, scatter_strategy)


def _move_outputs(n, dest, out, exact, kth, post_fn, strategy):
    """Dispatch the output move: run ``post_fn`` pre-move then scatter
    ("slab") / invert+gather ("invert"), or invert FIRST and run
    ``post_fn`` on the (n,) destination-ordered compact rows
    ("invert_late") — the epilogue then touches ~n rows instead of the
    padded flat row count (~1.6x fewer at 1M k=100).

    Measured on v5e 1M torus (scripts/micro_scatter_strategy.py,
    bit-identical outputs): "invert" wins — k=100 moments 426→353 ms,
    k=20 list 427→342 ms (XLA lowers the packed row scatter ~one
    serialized HBM pass per column; the 1-column index scatter + row
    gather vectorizes: 13-col standalone move 158→37 ms,
    scripts/micro_scatter_gather2.py). "invert_late" is a measured DEAD
    END (414 ms at k=100): gathering the 45-column raw stats costs more
    than the flat-row epilogue saves. Default: "invert".
    """
    if strategy == "invert_late" and post_fn is not None:
        return _invert_gather_then(n, dest, out, exact, kth, post_fn)
    if post_fn is not None:
        out = post_fn(out)
    strat = "invert" if strategy == "invert_late" else strategy
    return _scatter_outputs(n, dest, out, exact, kth, strategy=strat)


def _invert_gather_then(n: int, dest, out, exact, kth, post_fn):
    """Invert the row permutation, gather the RAW per-query outputs into
    destination order, then run ``post_fn`` on the (n,) compact rows.

    Row-for-row epilogues commute with the permutation, so this is
    semantically identical to post_fn-then-move — but the epilogue runs
    on n rows instead of the padded flat count. Uncovered destinations
    (dropped/overflow rows and the padding tail) are zeroed AFTER the
    epilogue, matching the scatter paths' zero-fill exactly (the
    epilogue's value on a zero stats row never leaks out).
    """
    rows = exact.shape[0]
    ridx = jnp.zeros((n,), jnp.int32).at[dest].set(
        jnp.arange(rows, dtype=jnp.int32) + 1, mode="drop")
    covered = ridx > 0
    src = jnp.where(covered, ridx - 1, rows)  # rows is OOB -> fill

    def move(a):
        fill = False if a.dtype == jnp.bool_ else 0
        return jnp.take(a, src, axis=0, mode="fill", fill_value=fill)

    out_n = post_fn(jax.tree_util.tree_map(move, out))

    def mask(a):
        c = covered.reshape((n,) + (1,) * (a.ndim - 1))
        return jnp.where(c, a, jnp.zeros((), a.dtype))

    out_n = jax.tree_util.tree_map(mask, out_n)
    return out_n, move(exact) & covered, move(kth)


def _scatter_outputs(n: int, dest, out, exact, kth, strategy: str = "invert"):
    """Move every per-query output to its (n,) destination in ONE pass.

    The naive per-leaf ``zeros(n, ...).at[dest].set`` costs a full
    scatter pass over ~n rows PER LEAF — 8 passes for the fused
    pipeline (5 curvature fields, (·,3) normals, exact, kth), ~15% of
    the 1M k=20 wall time. All float32 leaves (plus the bool ``exact``,
    ridden as a 0/1 f32 column) pack into one (rows, D) slab; columns
    are sliced back out (fused views, no extra pass). Leaves of other
    dtypes — none on the hot paths — move individually. Dropped/invalid
    rows (dest == n) zero-fill exactly as the per-leaf scatters did.

    Two layout strategies (``strategy``, a trace-time static so jit
    caches key on it): "slab" scatters the packed slab directly;
    "invert" scatters only a 1-column row index to invert the
    permutation, then GATHERS the slab rows in destination order. Both
    zero-fill uncovered rows. A/B them with
    scripts/micro_scatter_gather2.py (all data generated on-device) and
    the real-pipeline harness before flipping any default.
    """
    leaves, treedef = jax.tree_util.tree_flatten(out)
    rows = exact.shape[0]
    packed = [exact.astype(jnp.float32)[:, None], kth[:, None]]
    spans = []                      # (leaf idx, col start, trailing shape, w)
    col = 2
    for i, a in enumerate(leaves):
        if a.dtype == jnp.float32:
            f = a.reshape(rows, -1)
            packed.append(f)
            spans.append((i, col, a.shape[1:], f.shape[1]))
            col += f.shape[1]
    slab = jnp.concatenate(packed, axis=1) if len(packed) > 1 else packed[0]
    if strategy == "invert":
        ridx = jnp.zeros((n,), jnp.int32).at[dest].set(
            jnp.arange(rows, dtype=jnp.int32) + 1, mode="drop")
        src = jnp.where(ridx > 0, ridx - 1, rows)  # rows is OOB -> fill
        slab_n = jnp.take(slab, src, axis=0, mode="fill", fill_value=0.0)
    else:
        src = None
        slab_n = jnp.zeros((n, slab.shape[1]), jnp.float32).at[dest].set(
            slab, mode="drop")
    exact_n = slab_n[:, 0] > 0.5
    kth_n = slab_n[:, 1]
    new_leaves = list(leaves)
    for i, s, shp, w in spans:
        new_leaves[i] = slab_n[:, s:s + w].reshape((n,) + shp)
    for i, a in enumerate(leaves):
        if a.dtype != jnp.float32:
            if src is not None:
                new_leaves[i] = jnp.take(a, src, axis=0, mode="fill",
                                         fill_value=0)
            else:
                new_leaves[i] = jnp.zeros((n,) + a.shape[1:], a.dtype).at[
                    dest].set(a, mode="drop")
    return (jax.tree_util.tree_unflatten(treedef, new_leaves), exact_n,
            kth_n)


class BucketSpec(NamedTuple):
    """Static shape class for one occupancy bucket of the cell loop.

    Cells are partitioned by ``key = max(count, ceil(total_run/27))`` —
    the per-cell size class that correlates BOTH padding axes (query
    slots and candidate width). One (capacity, cand_cap) compiled for
    the fullest cell wastes ~3x VPU work on a typical density spread;
    per-bucket statics keep the padding proportional to each cell's
    actual size.
    """
    hi_key: int      # bucket takes cells with key in (prev.hi_key, hi_key]
    capacity: int    # query slots (>= max count among members)
    cand_cap: int    # packed candidate budget (>= max summed-9-run
    # length among members; pack-group slack is added by _cand_m)
    max_cells: int   # static member-table size (tile-rounded)


def _bucket_tables(grid: GridIndex, cells: CellTable,
                   spec: tuple[BucketSpec, ...]):
    """Device-side partition of the cell table (+ runs) by size class.

    The last bucket also absorbs any key above its threshold (capped
    cells fall to the repair path via overflow flags, as in the
    single-bucket path). Returns per bucket:
    (cid, start, count, rs, run_len_unclipped, lost) with static
    ``max_cells`` rows each.
    """
    n = grid.sorted_points.shape[0]
    rs_a, run_len_a = _runs_table(grid, cells)
    tot = jnp.sum(run_len_a, axis=1)
    key = jnp.maximum(cells.count, (tot + 26) // 27)
    valid = cells.cell_id != PAD_ID
    tables = []
    lo = 0
    for b, sp in enumerate(spec):
        member = valid & (key > lo)
        if b < len(spec) - 1:
            member = member & (key <= sp.hi_key)
        rank = jnp.cumsum(member.astype(jnp.int32)) - 1
        slot = jnp.where(member, rank, sp.max_cells)

        def sc(a, fill, slot=slot, mcb=sp.max_cells):
            out = jnp.full((mcb,) + a.shape[1:], fill, a.dtype)
            return out.at[slot].set(a, mode="drop")

        tables.append((
            sc(cells.cell_id, PAD_ID), sc(cells.start, n),
            sc(cells.count, 0), sc(rs_a, 0), sc(run_len_a, 0),
            jnp.any(member & (rank >= sp.max_cells)),
        ))
        lo = sp.hi_key
    return tables


def bucketed_tile_args(grid: GridIndex, cells: CellTable,
                       spec: tuple[BucketSpec, ...], tile_cells: int,
                       select_impl: str, pad_tiles_to: int = 1,
                       demote_pallas: bool = True, pack: int | None = None,
                       k: int | None = None):
    """Per-bucket tile arguments for the bucketed cell loop.

    Returns a list of (BucketSpec, tile_args, select_impl) — one entry
    per bucket, tile_args shaped (num_tiles, tc, ...). ``pad_tiles_to``
    rounds each bucket's tile count up to a multiple (the device count
    for the sharded layer; pad tiles are empty cells and drop at the
    final scatter).
    """
    n = grid.sorted_points.shape[0]
    tables = _bucket_tables(grid, cells, spec)
    out = []
    for sp, (cid_b, start_b, count_b, rs_b, rl_b, lost) in zip(spec, tables):
        pack_b = _cand_pack(n) if pack is None else pack
        tc_b, impl_b = _working_set_guards(
            sp.capacity, tile_cells, sp.cand_cap, select_impl, demote_pallas,
            pack=pack_b, k=k)
        overflow_b = _budget_overflow(rl_b, sp.cand_cap) | lost
        pad = (-sp.max_cells) % tc_b
        tile_args = (
            jnp.pad(cid_b, (0, pad), constant_values=PAD_ID
                    ).reshape(-1, tc_b),
            jnp.pad(start_b, (0, pad), constant_values=n).reshape(-1, tc_b),
            jnp.pad(count_b, (0, pad)).reshape(-1, tc_b),
            jnp.pad(rs_b, ((0, pad), (0, 0))).reshape(-1, tc_b, 9),
            jnp.pad(rl_b, ((0, pad), (0, 0))).reshape(-1, tc_b, 9),
            jnp.pad(overflow_b, (0, pad)).reshape(-1, tc_b),
        )
        if pad_tiles_to > 1:
            nt = tile_args[0].shape[0]
            p2 = (-nt) % pad_tiles_to
            if p2:
                fills = (PAD_ID, n, 0, 0, 0, False)
                tile_args = tuple(
                    jnp.pad(a, ((0, p2),) + ((0, 0),) * (a.ndim - 1),
                            constant_values=f)
                    for a, f in zip(tile_args, fills))
        out.append((sp, tile_args, impl_b))
    return out


def apply_cellwise_bucketed(
    grid: GridIndex,
    cells: CellTable,
    k: int,
    fn,
    spec: tuple[BucketSpec, ...],
    tile_cells: int = 128,
    select_impl: str | None = None,
    dest_order: str = "original",
    runner=None,
    post_fn=None,
    scatter_strategy: str = "invert",
):
    """``apply_cellwise`` over occupancy-bucketed cells: each bucket runs
    the cell loop with its own (capacity, cand_cap) statics, so padding
    waste in the candidate gather, the select kernel, and the in-loop
    ``fn`` tracks each cell's actual size instead of the global maximum.
    Semantics identical to apply_cellwise (``probe_grid_buckets``
    guarantees the spec covers every cell; anything beyond the last
    bucket's statics degrades to exact=False, never to wrong results).

    ``post_fn``: optional row-for-row map over the concatenated flat
    outputs BEFORE the final scatter — see ``apply_cellwise``.

    Returns (outputs pytree of (n, ...), exact (n,), kth_dist (n,)).
    NOT jitted itself — call under jit.
    """
    if runner is None:
        runner = cellwise_tile_runner
    if select_impl is None:
        select_impl = default_select_impl()
    n = grid.sorted_points.shape[0]
    outs, exacts, kths, dests = [], [], [], []
    for sp, tile_args, impl_b in bucketed_tile_args(
            grid, cells, spec, tile_cells, select_impl,
            demote_pallas=runner is cellwise_tile_runner,
            pack=1 if runner is cellwise_tile_runner else None, k=k):
        one_tile = runner(grid, k, sp.capacity, sp.cand_cap, impl_b, fn)
        if _is_moments_runner(runner) and impl_b == "pallas":
            # single pallas call over all of this bucket's cells (see
            # apply_cellwise: pallas-in-lax.map compiles pathologically;
            # the XLA fallback stays tiled)
            cell_args = jax.tree_util.tree_map(
                lambda a: a.reshape((-1,) + a.shape[2:]), tile_args)
            out, exact, kth, qrow, ok_q = one_tile(cell_args)
            flat = lambda a: a.reshape((-1,) + a.shape[2:])
        else:
            out, exact, kth, qrow, ok_q = jax.lax.map(one_tile, tile_args)
            flat = lambda a: a.reshape((-1,) + a.shape[3:])
        dest_rows = flat(qrow)
        if dest_order == "original":
            dest_rows = grid.order[dest_rows]
        dests.append(jnp.where(flat(ok_q), dest_rows, n))
        outs.append(jax.tree_util.tree_map(flat, out))
        exacts.append(flat(exact))
        kths.append(flat(kth))

    dest = jnp.concatenate(dests)
    exact = jnp.concatenate(exacts)
    kth = jnp.concatenate(kths)
    out = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *outs)
    return _move_outputs(n, dest, out, exact & (~cells.overflow), kth,
                         post_fn, scatter_strategy)


def default_max_cells(n: int, k: int, tile_cells: int = 128) -> int:
    """Static occupied-cell budget: expected cells ≈ n/(1.9k) for
    auto-sized grids; 4× headroom, rounded to the tile size."""
    mc = min(n, max(tile_cells, (4 * n) // max(int(1.9 * k), 1)))
    return ((mc + tile_cells - 1) // tile_cells) * tile_cells


def knn_all_points(grid: GridIndex, k: int, capacity: int | None = None,
                   max_cells: int | None = None, tile_cells: int = 128
                   ) -> NeighborResult:
    """Cell-centric self-kNN for every point of the grid (sorted order)."""
    n = grid.sorted_points.shape[0]
    if capacity is None:
        capacity = ((int(2.5 * k) + 16 + 7) // 8) * 8  # 8-aligned: odd sublane
        # counts compile pathologically slowly in Mosaic (113 s vs 2 s)
    if max_cells is None:
        max_cells = default_max_cells(n, k, tile_cells)
    cells = compact_cells(grid, max_cells)
    return knn_cellwise(grid, cells, k, capacity=capacity,
                        tile_cells=tile_cells)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def probe_grid(grid: GridIndex, tile_cells: int = 128, capacity_cap: int = 256
               ) -> tuple[CellTable, int, int, int]:
    """Host-side adaptive tuning: one full compaction + one scalar sync.

    Returns (tight CellTable, capacity, max_cells, cand_cap): capacity
    covers the fullest cell (capped — overfull cells then fall to the
    repair path via exact=False), max_cells is the occupied count rounded
    to the tile, cand_cap the true max TOTAL 9-run candidate count (so
    the packed-run layout carries zero padding waste in the candidate
    axis beyond group alignment). Statics are bucketed (pow2 / multiples
    of 8) so recompiles stay bounded across clouds of a family.
    """
    n = grid.sorted_points.shape[0]
    probe = compact_cells(grid, n)
    import numpy as np

    num_cells = int(np.asarray(probe.num_cells))
    max_count = int(np.asarray(probe.max_count))
    capacity = min(_round_up(max(max_count, 4), 8), capacity_cap)
    mc = _round_up(max(num_cells, tile_cells), tile_cells)
    # pow2 bucket to bound recompilation across clouds
    mc = 1 << (mc - 1).bit_length()
    mc = min(mc, _round_up(n, tile_cells))
    cells = CellTable(
        probe.cell_id[:mc], probe.start[:mc], probe.count[:mc],
        probe.num_cells, probe.num_cells > mc, probe.max_count,
    )
    cand_cap = int(np.asarray(jnp.max(_probe_totrun(grid, cells))))
    cand_cap = min(_round_up(max(cand_cap, 4), 8), 27 * capacity)
    return cells, capacity, mc, cand_cap


@jax.jit
def _probe_totrun(grid: GridIndex, cells: CellTable) -> jax.Array:
    """(MC,) per-cell TOTAL candidate count: summed 3-cell x-run length
    over the 9 (dy,dz) offsets — what the packed-run layout budgets."""
    _, run_len_a = _runs_table(grid, cells)
    return jnp.sum(run_len_a, axis=1)


def _optimal_buckets(key_s, counts_s, tot_s, capacity_cap: int,
                     max_buckets: int, unit: int):
    """Exact min-cost partition of key-SORTED cells into <= max_buckets
    contiguous buckets (the probe's cost model: each bucket pays
    unit-rounded-cells · capacity · (cand_cap + 32), with capacity and
    cand_cap the 8-rounded per-bucket maxima of count and TOTAL packed
    run length).

    DP over the 8-aligned key-threshold boundaries —
    O(max_buckets · |bounds|²) with the inner minimization vectorized.
    The previous combinations() enumeration was exact only up to 3
    buckets before its cost exploded on clouds with many thresholds.

    key_s/counts_s/tot_s: per-cell arrays sorted by key ascending.
    Returns a non-empty tuple of BucketSpec.
    """
    import numpy as np

    num_cells = len(key_s)

    def r8(x):
        return np.maximum(8, ((np.asarray(x, np.int64) + 7) // 8) * 8)

    kmax = int(key_s[-1])
    bounds = sorted(
        {int(np.searchsorted(key_s, c, side="right"))
         for c in range(8, int(r8(kmax)) + 1, 8) if c < kmax}
        | {0, num_cells})
    B = np.asarray(bounds, dtype=np.int64)
    nb = len(B)
    # per-boundary-segment maxima; a bucket [B[j], B[i]) then takes the
    # RANGE maxima of its own cells (prefix maxima from 0 overpad when a
    # small-count cell carries a large key via its candidate total).
    # cand_cap is never clipped by capacity across buckets: a low-count
    # cell bordering a dense cell has a big candidate total but lands in
    # a small-capacity bucket, and clipping voided its exactness
    # certificate (flagged overflowed).
    seg_c = np.asarray([counts_s[B[j]:B[j + 1]].max(initial=0)
                        for j in range(nb - 1)], dtype=np.int64)
    seg_r = np.asarray([tot_s[B[j]:B[j + 1]].max(initial=0)
                        for j in range(nb - 1)], dtype=np.int64)
    # cost[i][j] for j < i, precomputed (b-independent)
    cost = [None] * nb
    for i in range(1, nb):
        cmax = np.maximum.accumulate(seg_c[:i][::-1])[::-1]
        rmax = np.maximum.accumulate(seg_r[:i][::-1])[::-1]
        cap = np.minimum(r8(cmax), capacity_cap)
        rc = r8(rmax)
        size = ((B[i] - B[:i] + unit - 1) // unit) * unit
        cost[i] = size.astype(np.float64) * cap * (rc + 32.0)
    dp = np.full(nb, np.inf)
    dp[0] = 0.0
    # parent[b, i]: j of the bucket [B[j], B[i]) added at level b, or -1
    # when level b keeps the (b-1)-bucket solution for i
    parent = np.full((max_buckets, nb), -1, dtype=np.int64)
    for b in range(max_buckets):
        ndp = dp.copy()
        for i in range(1, nb):
            tot = dp[:i] + cost[i]
            j = int(np.argmin(tot))
            if tot[j] < ndp[i]:
                ndp[i] = tot[j]
                parent[b, i] = j
        dp = ndp
    out, b, i = [], max_buckets - 1, nb - 1
    while i > 0:
        j = parent[b, i]
        if j < 0:
            b -= 1
            continue
        out.append(BucketSpec(
            hi_key=int(key_s[B[i] - 1]),
            capacity=int(min(r8(counts_s[B[j]:B[i]].max()), capacity_cap)),
            cand_cap=int(r8(tot_s[B[j]:B[i]].max())),
            max_cells=int((((B[i] - B[j]) + unit - 1) // unit) * unit)))
        b, i = b - 1, int(j)
    return tuple(reversed(out))


def probe_grid_buckets(grid: GridIndex, tile_cells: int = 128,
                       capacity_cap: int = 256, max_buckets: int = 6,
                       size_unit: int | None = None,
                       split_to: int | None = None,
                       coarse: bool = False):
    """Host-side bucket tuning: one compaction + runs probe + one sync.

    Partitions occupied cells by size class key = max(count,
    ceil(total_run/27)) into <= max_buckets buckets, choosing the
    8-aligned thresholds that minimize the modeled cell-loop cost
    Σ_b cells_b · capacity_b · (cand_cap_b + 32) — the select kernel's
    work plus a constant per-slot term for the fused curvature chain.
    Sizes are rounded to ``size_unit`` (default 4·tile_cells: sub-1%
    padded-cell waste at production sizes; statics change per cloud, so
    rely on the persistent compilation cache for reuse within a family).

    Returns (spec, max_cells_total) for apply_cellwise_bucketed /
    compact_cells.

    ``split_to``: model cells as virtually split to <= split_to queries
    per row (``split_cells``) and return (spec, max_cells_total, factor)
    instead — the spec then never exceeds capacity ``split_to``; pass
    the factor to ``split_cells`` (1 = no split needed). Used by the
    moments engine, whose kernel compile time explodes beyond
    capacity 128 on sparse clouds with big cells.
    """
    import numpy as np

    n = grid.sorted_points.shape[0]
    probe = compact_cells(grid, n)
    num_cells = int(np.asarray(probe.num_cells))
    # slice ON DEVICE before the host copy: the probe tables are (n,)
    # and the tunnel moves ~MBs in seconds — pulling the full 1M-row
    # count/totrun arrays cost ~10-20 s per probe (measured inside the
    # 1M normals stage); the occupied prefix is ~n/(1.9k) rows
    hi = min(n, _round_up(max(num_cells, 1), 128))
    counts = np.asarray(probe.count[:hi])[:num_cells]
    tot = np.asarray(_probe_totrun(grid, probe)[:hi])[:num_cells]
    factor = 1
    num_cells_unsplit = num_cells
    if split_to is not None and num_cells and counts.max() > split_to:
        factor = int(-(-int(counts.max()) // split_to))
        reps = -(-counts // split_to)
        idx = np.repeat(np.arange(num_cells), reps)
        within = np.arange(len(idx)) - np.repeat(np.cumsum(reps) - reps, reps)
        counts = np.minimum(counts[idx] - within * split_to, split_to)
        tot = tot[idx]       # virtual copies keep the full candidate set
        num_cells = len(idx)
    key = np.maximum(counts, (tot + 26) // 27)

    unit = size_unit if size_unit is not None else 4 * tile_cells

    spec = (BucketSpec(hi_key=8, capacity=8, cand_cap=216, max_cells=unit),)
    if coarse and num_cells:
        # ONE coarsely-rounded bucket: capacity to 16, cand_cap to 512,
        # member table to pow2 — the statics collide across clouds of a
        # family, so a compiled program is REUSED instead of re-tuned
        # (the DP thresholds below are data-dependent: every cloud got
        # its own spec and its own ~50 s fused-program compile, measured
        # in the mesh pipeline's per-row t_curvature). Padding waste of
        # the single bucket (~3x VPU on spread clouds) is the price —
        # right for once-per-mesh vertex fits, wrong for the headline.
        cap = min(int(_round_up(max(int(counts.max()), 8), 16)),
                  capacity_cap)
        cand = int(_round_up(max(int(tot.max()), 216), 512))
        mc_b = 1 << (max(int(num_cells), unit) - 1).bit_length()
        spec = (BucketSpec(hi_key=1 << 30, capacity=cap, cand_cap=cand,
                           max_cells=mc_b),)
    elif num_cells:
        order = np.argsort(key, kind="stable")
        spec = _optimal_buckets(key[order], counts[order], tot[order],
                                capacity_cap, max_buckets, unit)

    # mc sizes compact_cells' UNSPLIT table (split_cells multiplies rows
    # by the factor afterwards)
    mc = _round_up(max(num_cells_unsplit, tile_cells), tile_cells)
    mc = min(1 << (mc - 1).bit_length(), _round_up(n, tile_cells))
    if split_to is not None:
        return spec, mc, factor
    return spec, mc


def knn_all_points_auto(grid: GridIndex, k: int, tile_cells: int = 128
                        ) -> NeighborResult:
    """Self-kNN with host-probed capacity: minimal slot padding."""
    cells, capacity, _, cand_cap = probe_grid(grid, tile_cells)
    return knn_cellwise(grid, cells, k, capacity=capacity,
                        tile_cells=tile_cells, cand_cap=cand_cap)


def knn_all_points_auto_bucketed(grid: GridIndex, k: int,
                                 tile_cells: int = 128) -> NeighborResult:
    """Self-kNN with host-probed occupancy buckets: per-bucket statics
    keep select/gather padding proportional to each cell's size — the
    library-kNN counterpart of the fused pipeline's bucketed layout."""
    spec, mc = probe_grid_buckets(grid, tile_cells)
    cells = compact_cells(grid, mc)
    return knn_cellwise_bucketed(grid, cells, k, tuple(spec),
                                 tile_cells=tile_cells)
