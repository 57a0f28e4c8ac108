"""Pallas TPU kernel: DMA-band kNN — zero XLA candidate gathers.

STATUS: EXPERIMENTAL — correct (validated against the XLA kernel in
interpret mode; see tests/test_pallas.py) but not yet compilable on
real TPUs: Mosaic requires 1D DMA slice offsets AND shapes to align to
the 1024-element f32 tiling, and aligning band starts down to 1024
forces a ~38x candidate over-width that erases the gather savings.
Production kNN uses ops/pallas_select.py (fused distance+select on
XLA-gathered candidates). Revisit when Mosaic supports unaligned 1D DMA
or dynamic sublane-offset VMEM slicing.

The cell-centric kNN's remaining XLA cost is the candidate gather
(~0.6 s/1M) plus index plumbing. This kernel removes it: for a block of
cells that share a grid (y,z) row (see ``build_row_blocks``), the 27
candidate cells collapse into 9 CONTIGUOUS sorted-row bands of bounded
length, so each program

  1. DMAs the 9 bands (x/y/z planes) from HBM into VMEM scratch,
  2. computes the exact (queries × band) distance matrix per band on the
     VPU and concatenates along the lane axis (Mosaic forbids cross-lane
     reshapes; concatenation is supported),
  3. runs the k-selection loop in VMEM,
  4. reconstructs global sorted-row ids arithmetically (no gather).

All small per-cell integers live in SMEM and are read as scalars;
per-query expansions use select-sums over the (static) cell slots, never
reshapes. Query coordinates arrive pre-shaped (NB, Q, 1) because Mosaic
also forbids dynamic lane-offset VMEM slicing (they cannot be sliced out
of the center band in-kernel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38  # python scalar: jnp constants cannot be captured by kernels


DMA_BAND = 1024  # DMA slice shapes must align to the 1D f32 tiling (1024);
                 # we transfer a fixed 1024-row superset per band (bandwidth
                 # is cheap) and compute on the first `band` columns


def _band_kernel(bs_ref, rsrel_ref, rlen_ref, qrowb_ref, lo_ref, hi_ref,
                 qx_ref, qy_ref, qz_ref,
                 px_ref, py_ref, pz_ref,
                 dist_ref, row_ref, cover_ref,
                 bx, by, bz, sem,
                 *, k: int, bc: int, cap: int, band: int):
    nine = 9
    m = nine * band
    q = bc * cap

    # --- 1. DMA the 9 bands (fixed aligned size), all in flight, wait ---
    copies = []
    for j in range(nine):
        s = bs_ref[0, 0, j]
        for t, (src, dst) in enumerate(((px_ref, bx), (py_ref, by),
                                        (pz_ref, bz))):
            c = pltpu.make_async_copy(src.at[pl.ds(s, DMA_BAND)], dst.at[j],
                                      sem.at[j * 3 + t])
            c.start()
            copies.append(c)
    for c in copies:
        c.wait()

    qx = qx_ref[0]                                    # (Q, 1)
    qy = qy_ref[0]
    qz = qz_ref[0]

    # per-query cell slot (Q,1) and select-sum helpers (no gathers)
    qidx = jax.lax.broadcasted_iota(jnp.int32, (q, 1), 0)
    cell_of_q = qidx // cap
    slot_of_q = qidx % cap

    def per_cell_i(values):
        acc = jnp.zeros((q, 1), jnp.int32)
        for c in range(bc):
            acc = jnp.where(cell_of_q == c, values[c], acc)
        return acc

    def per_cell_f(values):
        acc = jnp.zeros((q, 1), jnp.float32)
        for c in range(bc):
            acc = jnp.where(cell_of_q == c, values[c], acc)
        return acc

    qrow = per_cell_i([qrowb_ref[0, 0, c] for c in range(bc)]) + slot_of_q

    # --- 2. per-band distances + masks, lane-axis concatenation ---
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (q, band), 1)
    d2_parts = []
    for j in range(nine):
        cxj = bx[j:j + 1, :band]                      # (1, band)
        cyj = by[j:j + 1, :band]
        czj = bz[j:j + 1, :band]
        dx = qx - cxj
        dy = qy - cyj
        dz = qz - czj
        d2j = dx * dx + dy * dy + dz * dz             # (Q, band)
        loj = per_cell_i([rsrel_ref[0, c, j] for c in range(bc)])
        lnj = per_cell_i([rlen_ref[0, c, j] for c in range(bc)])
        okj = (p_iota >= loj) & (p_iota < loj + lnj)
        growj = bs_ref[0, 0, j] + p_iota
        okj = okj & (growj != qrow)
        d2_parts.append(jnp.where(okj, d2j, _INF))
    d2 = jnp.concatenate(d2_parts, axis=1)            # (Q, M)

    # coverage radius of the 3³ window per query (for exactness certs)
    lox = per_cell_f([lo_ref[0, c, 0] for c in range(bc)])
    loy = per_cell_f([lo_ref[0, c, 1] for c in range(bc)])
    loz = per_cell_f([lo_ref[0, c, 2] for c in range(bc)])
    hix = per_cell_f([hi_ref[0, c, 0] for c in range(bc)])
    hiy = per_cell_f([hi_ref[0, c, 1] for c in range(bc)])
    hiz = per_cell_f([hi_ref[0, c, 2] for c in range(bc)])
    cover = jnp.minimum(
        jnp.minimum(jnp.minimum(qx - lox, hix - qx),
                    jnp.minimum(qy - loy, hiy - qy)),
        jnp.minimum(qz - loz, hiz - qz))
    cover_ref[0] = cover

    # --- 3. k-selection (min + first-argmin + mask-out) ---
    iota = jax.lax.broadcasted_iota(jnp.int32, (q, m), 1)
    for j in range(k):
        mn = jnp.min(d2, axis=-1, keepdims=True)      # (Q, 1)
        hit = d2 == mn
        am = jnp.min(jnp.where(hit, iota, m), axis=-1, keepdims=True)
        dist_ref[0, :, j] = jnp.sqrt(jnp.maximum(mn, 0.0))[:, 0]
        # --- 4. global row id arithmetically ---
        amj = am // band
        row = am % band
        out = jnp.zeros_like(am)
        for jj in range(nine):
            out = jnp.where(amj == jj, bs_ref[0, 0, jj] + row, out)
        row_ref[0, :, j] = out[:, 0]
        d2 = jnp.where(iota == am, _INF, d2)


@partial(jax.jit, static_argnames=("k", "bc", "cap", "band", "interpret"))
def knn_band_select(px, py, pz, bs, rs_rel, run_len, qpts, qrow_base,
                    lo_edge, hi_edge,
                    k: int, bc: int, cap: int, band: int,
                    interpret: bool = False):
    """px/py/pz: (Npad,) f32 coordinate planes (padded by >= band rows).
    bs: (NB, 9) i32 band starts; rs_rel/run_len: (NB, BC, 9) i32 run
    windows relative to the band start; qpts: (NB, BC·cap, 3) f32 query
    coordinates; qrow_base: (NB, BC) i32 global row of each cell's first
    query; lo_edge/hi_edge: (NB, BC, 3) f32 window edges (±1e30 at grid
    boundaries).

    Returns (dists (NB·BC·cap, k) f32 ascending, rows (NB·BC·cap, k) i32
    global sorted-row ids, cover (NB·BC·cap,) f32 coverage radii).
    Missing neighbors carry ~3e38 distances.
    """
    nb = bs.shape[0]
    grid = (nb,)
    sm = pltpu.SMEM
    vm = pltpu.VMEM
    qn = bc * cap
    out_rows = nb * qn

    dists, rows, cover = pl.pallas_call(
        partial(_band_kernel, k=k, bc=bc, cap=cap, band=band),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 9), lambda b: (b, 0, 0), memory_space=sm),
            pl.BlockSpec((1, bc, 9), lambda b: (b, 0, 0), memory_space=sm),
            pl.BlockSpec((1, bc, 9), lambda b: (b, 0, 0), memory_space=sm),
            pl.BlockSpec((1, 1, bc), lambda b: (b, 0, 0), memory_space=sm),
            pl.BlockSpec((1, bc, 3), lambda b: (b, 0, 0), memory_space=sm),
            pl.BlockSpec((1, bc, 3), lambda b: (b, 0, 0), memory_space=sm),
            pl.BlockSpec((1, qn, 1), lambda b: (b, 0, 0), memory_space=vm),
            pl.BlockSpec((1, qn, 1), lambda b: (b, 0, 0), memory_space=vm),
            pl.BlockSpec((1, qn, 1), lambda b: (b, 0, 0), memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=(
            pl.BlockSpec((1, qn, k), lambda b: (b, 0, 0), memory_space=vm),
            pl.BlockSpec((1, qn, k), lambda b: (b, 0, 0), memory_space=vm),
            pl.BlockSpec((1, qn, 1), lambda b: (b, 0, 0), memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, qn, k), jnp.float32),
            jax.ShapeDtypeStruct((nb, qn, k), jnp.int32),
            jax.ShapeDtypeStruct((nb, qn, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((9, DMA_BAND), jnp.float32),
            pltpu.VMEM((9, DMA_BAND), jnp.float32),
            pltpu.VMEM((9, DMA_BAND), jnp.float32),
            pltpu.SemaphoreType.DMA((27,)),
        ],
        interpret=interpret,
    )(bs[:, None, :], rs_rel, run_len, qrow_base[:, None, :],
      lo_edge, hi_edge,
      qpts[..., 0:1], qpts[..., 1:2], qpts[..., 2:3],
      px, py, pz)
    return (dists.reshape(out_rows, k), rows.reshape(out_rows, k),
            cover.reshape(out_rows))
