"""DMA-band kNN driver (EXPERIMENTAL — measured dead end, see package
docstring). Moved out of ``neighbors.cellknn`` so production modules
carry no untestable-on-TPU code; semantics are locked in by the
interpret-mode test in tests/test_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pct_tpu.neighbors.cellknn import CellTable, _decode
from pct_tpu.neighbors.grid import MAXDIM, PAD_ID, GridIndex
from pct_tpu.neighbors.knn import NeighborResult


@partial(jax.jit, static_argnames=("k", "capacity", "bc", "band", "lean",
                                   "interpret"))
def knn_cellwise_band(
    grid: GridIndex,
    cells: CellTable,
    block_index: jax.Array,       # (NB·BC,) int32 from build_row_blocks
    k: int,
    capacity: int,
    bc: int = 8,
    band: int | None = None,
    lean: bool = True,
    interpret: bool = False,
) -> NeighborResult:
    """DMA-band kNN (see experimental/pallas_band.py): zero XLA candidate
    gathers.

    Emits SORTED-space neighbor ids (lean layout). Requires row-aligned
    blocks; ``band`` defaults to the guaranteed bound (bc+3)·capacity
    rounded to 128 lanes.
    """
    from pct_tpu.experimental.pallas_band import DMA_BAND, knn_band_select

    n = grid.sorted_points.shape[0]
    if band is None:
        band = ((bc + 3) * capacity + 127) // 128 * 128
    if band > DMA_BAND:
        raise ValueError(
            f"band {band} exceeds the kernel's DMA window {DMA_BAND}: "
            f"reduce bc (currently {bc}) or capacity (currently {capacity}) "
            f"so (bc+3)*capacity <= {DMA_BAND}")
    nb = block_index.shape[0] // bc
    bi = block_index.reshape(nb, bc)
    ok_slot = bi >= 0
    bi_c = jnp.where(ok_slot, bi, 0)
    start = jnp.where(ok_slot, cells.start[bi_c], n)
    count = jnp.where(ok_slot, cells.count[bi_c], 0)
    cid = jnp.where(ok_slot, cells.cell_id[bi_c], PAD_ID)

    dims = grid.dims
    ix, iy, iz = _decode(jnp.where(cid == PAD_ID, 0, cid))
    dyz = jnp.array([(dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)],
                    dtype=jnp.int32)
    ny = iy[..., None] + dyz[None, None, :, 0]
    nz = iz[..., None] + dyz[None, None, :, 1]
    ok_run = ((ny >= 0) & (ny < dims[1]) & (nz >= 0) & (nz < dims[2])
              & ok_slot[..., None])
    base = ny * MAXDIM + nz * MAXDIM * MAXDIM                  # (NB, BC, 9)
    run_lo = base + jnp.maximum(ix - 1, 0)[..., None]
    run_hi = base + jnp.minimum(ix + 1, dims[0] - 1)[..., None]
    rs = jnp.searchsorted(grid.sorted_ids, run_lo, side="left",
                          method="sort").astype(jnp.int32)
    re = jnp.searchsorted(grid.sorted_ids, run_hi + 1, side="left",
                          method="sort").astype(jnp.int32)
    run_len = jnp.where(ok_run, re - rs, 0)

    big = jnp.int32(n)
    rs_v = jnp.where(run_len > 0, rs, big)
    bs = jnp.min(rs_v, axis=1)                                  # (NB, 9)
    bs = jnp.where(bs == big, 0, bs)
    band_end = jnp.max(jnp.where(run_len > 0, rs + run_len, 0), axis=1)
    band_ok = jnp.all(band_end - bs <= band, axis=-1)           # (NB,)
    rs_rel = jnp.clip(rs - bs[:, None, :], 0, band - 1)
    run_len = jnp.minimum(run_len, band - rs_rel)

    # cell window edges for the in-kernel coverage radius
    coords = jnp.stack([ix, iy, iz], axis=-1)                   # (NB, BC, 3)
    cellsz = grid.cell_size
    lo_edge = grid.origin + (coords - 1).astype(jnp.float32) * cellsz
    hi_edge = grid.origin + (coords + 2).astype(jnp.float32) * cellsz
    lo_edge = jnp.where(coords - 1 <= 0, -1e30, lo_edge)
    hi_edge = jnp.where(coords + 1 >= dims - 1, 1e30, hi_edge)

    # pad coordinate planes so band DMA never over-reads (the kernel
    # transfers fixed 1024-row aligned bands regardless of `band`)
    pts = grid.sorted_points
    pad = jnp.zeros((max(band, DMA_BAND), 3), pts.dtype)
    pp = jnp.concatenate([pts, pad], axis=0)
    qslot = jnp.arange(capacity, dtype=jnp.int32)[None, None, :]
    qrow3 = jnp.minimum(start[..., None] + qslot, n - 1)        # (NB, BC, C)
    qpts = pts[qrow3.reshape(nb, bc * capacity)]                # (NB, Q, 3)
    dists, rows, cover = knn_band_select(
        pp[:, 0], pp[:, 1], pp[:, 2], bs, rs_rel, run_len, qpts, start,
        lo_edge, hi_edge, k=k, bc=bc, cap=capacity, band=band,
        interpret=interpret)

    found = dists < 1e18                                        # (S, k)
    qrow = qrow3.reshape(-1)
    ok_q = (qslot < count[..., None]).reshape(-1)
    exact = (found[:, k - 1] & (dists[:, k - 1] <= cover)
             & jnp.repeat(band_ok, bc * capacity) & (~cells.overflow))
    dest = jnp.where(ok_q, qrow, n)
    out_idx = jnp.zeros((n, k), jnp.int32).at[dest].set(rows, mode="drop")
    out_e = jnp.zeros((n,), bool).at[dest].set(exact, mode="drop")
    kth = jnp.zeros((n,), jnp.float32).at[dest].set(dists[:, k - 1],
                                                    mode="drop")
    if lean:
        return NeighborResult(out_idx, kth[:, None], None, out_e)
    out_d = jnp.zeros((n, k), jnp.float32).at[dest].set(dists, mode="drop")
    out_f = jnp.zeros((n, k), bool).at[dest].set(found, mode="drop")
    return NeighborResult(out_idx, out_d, out_f, out_e)


def build_row_blocks(cells: CellTable, block_cells: int) -> "np.ndarray":
    """Host-side block layout for the DMA-band kernel: blocks of
    ``block_cells`` occupied-cell slots that never span a grid (y,z)-row
    transition — this guarantees each block's 27-cell candidate set is 9
    CONTIGUOUS sorted-row bands of at most (block_cells+2)·capacity rows.

    Returns (NB·block_cells,) int32 indices into the CellTable arrays,
    -1 for padding slots.
    """
    import numpy as np

    cid = np.asarray(cells.cell_id)
    num = int(np.asarray(cells.num_cells))
    cid = cid[:num]
    row_key = cid // MAXDIM          # iy + iz*MAXDIM — constant per row
    blocks = []
    start = 0
    for end in np.append(np.where(np.diff(row_key) != 0)[0] + 1, num):
        for b0 in range(start, end, block_cells):
            blk = list(range(b0, min(b0 + block_cells, end)))
            blk += [-1] * (block_cells - len(blk))
            blocks.append(blk)
        start = end
    if not blocks:
        blocks = [[-1] * block_cells]
    return np.asarray(blocks, dtype=np.int32).reshape(-1)
