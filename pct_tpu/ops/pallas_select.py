"""Pallas TPU kernel: fused neighborhood distance + k-nearest selection.

Replaces the XLA sequence [einsum distance matmul → HBM-materialized
(T,C,M) distance tensor → lax.top_k → candidate index select] inside the
cell-centric kNN with ONE kernel that keeps the distance matrix in VMEM:

  per program (a block of Tp cells):
    d²[c,m] = Σ_axis (q[c] − p[m])²          exact VPU differences —
                                              no |q|²+|p|²−2qp expansion,
                                              so no cancellation and no
                                              cell-local recentering
    k × (min, first-argmin via iota trick, mask-out)   selection loop

Coordinates are passed as separate per-axis 2D arrays — Mosaic tiles the
last dimension onto 128 lanes, so a trailing xyz dimension of 3 would
waste 125/128 lanes and trip unsupported-gather lowerings.

Outputs per query row: ascending distances (Tp,C,k) and candidate
POSITIONS in the M axis (Tp,C,k) — the caller maps positions through its
candidate-row table. Self-exclusion and run-validity are fused via the
candidate/query row ids.

`interpret=True` (CPU tests) runs the same kernel through the Pallas
interpreter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38  # python scalar: jnp constants cannot be captured by kernels


def _compiler_kwargs(vmem_limit: int | None):
    """compiler_params kwarg for pallas_call: raise Mosaic's scoped-VMEM
    budget (default 16 MB; v5e has 128 MB) ONLY when the caller's working
    -set plan asked for it — omitting the param entirely keeps programs
    that fit the default budget byte-identical to pre-plan builds (no
    cache invalidation of the known-good headline configs)."""
    if vmem_limit is None:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=int(vmem_limit))}


def _axes3(a):
    """Per-axis (.., M) views of (..., 3) coords or an already-split
    3-tuple. Callers in the packed cell loop pass the tuple form — a
    (T,M,3) intermediate would tile its trailing 3 onto 128 lanes."""
    if isinstance(a, (tuple, list)):
        return a
    return a[..., 0], a[..., 1], a[..., 2]


def _select_kernel(qx_ref, qy_ref, qz_ref, px_ref, py_ref, pz_ref,
                   cand_ref, qrow_ref, len_ref,
                   dist_ref, pos_ref, *, k: int):
    qx, qy, qz = qx_ref[:], qy_ref[:], qz_ref[:]     # (Tp, C)
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]     # (Tp, M)
    cand = cand_ref[:]               # (Tp, M) int32 sorted-row of candidate
    qrow = qrow_ref[:]               # (Tp, C) int32 sorted-row of query
    run_len = len_ref[:]             # (Tp, M) int32: 1 = valid slot

    dx = qx[:, :, None] - px[:, None, :]
    dy = qy[:, :, None] - py[:, None, :]
    dz = qz[:, :, None] - pz[:, None, :]
    d2 = dx * dx + dy * dy + dz * dz                 # (Tp, C, M)

    ok = (run_len[:, None, :] > 0) & (cand[:, None, :] != qrow[:, :, None])
    d2 = jnp.where(ok, d2, _INF)

    m = d2.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, dimension=2)
    for j in range(k):
        mn = jnp.min(d2, axis=-1)                    # (Tp, C)
        hit = d2 == mn[:, :, None]
        am = jnp.min(jnp.where(hit, iota, m), axis=-1)   # first argmin
        dist_ref[:, :, j] = jnp.sqrt(jnp.maximum(mn, 0.0))
        pos_ref[:, :, j] = am
        d2 = jnp.where(iota == am[:, :, None], _INF, d2)


def _select_coords_kernel(qx_ref, qy_ref, qz_ref, px_ref, py_ref, pz_ref,
                          cand_ref, qrow_ref, len_ref,
                          dist_ref, nx_ref, ny_ref, nz_ref, *, k: int):
    """Variant of _select_kernel that emits the WINNER COORDINATES
    instead of candidate positions: the per-round first-argmin mask that
    already exists for the mask-out step doubles as a select-sum
    extractor (3 extra masked reductions per round), so the caller's
    (T,C,k) winner gather from the candidate block — the costliest XLA
    gather in the fused pipeline — never happens. Missing slots carry
    ~3e38 distances and whatever coords the argmin fell on (the fused
    chain uses all k slots unconditionally, exactly like the gather
    path; rows are audited via the exactness certificate)."""
    qx, qy, qz = qx_ref[:], qy_ref[:], qz_ref[:]     # (Tp, C)
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]     # (Tp, M)
    cand = cand_ref[:]
    qrow = qrow_ref[:]
    run_len = len_ref[:]

    dx = qx[:, :, None] - px[:, None, :]
    dy = qy[:, :, None] - py[:, None, :]
    dz = qz[:, :, None] - pz[:, None, :]
    d2 = dx * dx + dy * dy + dz * dz                 # (Tp, C, M)

    ok = (run_len[:, None, :] > 0) & (cand[:, None, :] != qrow[:, :, None])
    d2 = jnp.where(ok, d2, _INF)

    m = d2.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, dimension=2)
    pxb = px[:, None, :]
    pyb = py[:, None, :]
    pzb = pz[:, None, :]
    for j in range(k):
        mn = jnp.min(d2, axis=-1)                    # (Tp, C)
        hit = d2 == mn[:, :, None]
        am = jnp.min(jnp.where(hit, iota, m), axis=-1)   # first argmin
        sel = iota == am[:, :, None]
        dist_ref[:, :, j] = jnp.sqrt(jnp.maximum(mn, 0.0))
        nx_ref[:, :, j] = jnp.sum(jnp.where(sel, pxb, 0.0), axis=-1)
        ny_ref[:, :, j] = jnp.sum(jnp.where(sel, pyb, 0.0), axis=-1)
        nz_ref[:, :, j] = jnp.sum(jnp.where(sel, pzb, 0.0), axis=-1)
        d2 = jnp.where(sel, _INF, d2)


def _select_rows_kernel(qx_ref, qy_ref, qz_ref, px_ref, py_ref, pz_ref,
                        cand_ref, qrow_ref, len_ref,
                        dist_ref, row_ref, *, k: int):
    """Variant of _select_kernel that emits the winners' GLOBAL sorted
    rows (cand[pos]) instead of positions: the caller's (T,C,k) winner-id
    gather from the candidate table never happens (one extra masked int
    reduction per round, reusing the mask-out select)."""
    qx, qy, qz = qx_ref[:], qy_ref[:], qz_ref[:]     # (Tp, C)
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]     # (Tp, M)
    cand = cand_ref[:]
    qrow = qrow_ref[:]
    run_len = len_ref[:]

    dx = qx[:, :, None] - px[:, None, :]
    dy = qy[:, :, None] - py[:, None, :]
    dz = qz[:, :, None] - pz[:, None, :]
    d2 = dx * dx + dy * dy + dz * dz                 # (Tp, C, M)

    ok = (run_len[:, None, :] > 0) & (cand[:, None, :] != qrow[:, :, None])
    d2 = jnp.where(ok, d2, _INF)

    m = d2.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, dimension=2)
    candb = cand[:, None, :]
    for j in range(k):
        mn = jnp.min(d2, axis=-1)                    # (Tp, C)
        hit = d2 == mn[:, :, None]
        am = jnp.min(jnp.where(hit, iota, m), axis=-1)   # first argmin
        sel = iota == am[:, :, None]
        dist_ref[:, :, j] = jnp.sqrt(jnp.maximum(mn, 0.0))
        row_ref[:, :, j] = jnp.sum(jnp.where(sel, candb, 0), axis=-1)
        d2 = jnp.where(sel, _INF, d2)


@partial(jax.jit, static_argnames=("k", "block_cells", "interpret",
                                   "vmem_limit"))
def knn_select_rows(qpts: jax.Array, cpts: jax.Array, cand: jax.Array,
                    qrow: jax.Array, valid: jax.Array, k: int,
                    block_cells: int = 8, interpret: bool = False,
                    vmem_limit: int | None = None):
    """(T,C,3) queries vs (T,M,3)-or-per-axis-tuple candidates ->
    (dists (T,C,k), rows (T,C,k) winner sorted-row ids == cand[pos])."""
    t, c, _ = qpts.shape
    px, py, pz = _axes3(cpts)
    m = px.shape[1]
    pad_t = (-t) % block_cells
    if pad_t:
        qpts = jnp.pad(qpts, ((0, pad_t), (0, 0), (0, 0)))
        px, py, pz = (jnp.pad(a, ((0, pad_t), (0, 0))) for a in (px, py, pz))
        cand = jnp.pad(cand, ((0, pad_t), (0, 0)), constant_values=-2)
        qrow = jnp.pad(qrow, ((0, pad_t), (0, 0)), constant_values=-1)
        valid = jnp.pad(valid, ((0, pad_t), (0, 0)))
    tp = qpts.shape[0]
    grid = (tp // block_cells,)

    b3 = lambda i: (i, 0, 0)
    b2 = lambda i: (i, 0)
    vm = pltpu.VMEM

    dists, rows = pl.pallas_call(
        partial(_select_rows_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((block_cells, c, k), b3, memory_space=vm),
            pl.BlockSpec((block_cells, c, k), b3, memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, c, k), jnp.float32),
            jax.ShapeDtypeStruct((tp, c, k), jnp.int32),
        ),
        interpret=interpret,
        **_compiler_kwargs(vmem_limit),
    )(qpts[..., 0], qpts[..., 1], qpts[..., 2], px, py, pz,
      cand, qrow, valid)
    return dists[:t], rows[:t]


@partial(jax.jit, static_argnames=("k", "block_cells", "interpret",
                                   "vmem_limit"))
def knn_select_coords(qpts: jax.Array, cpts: jax.Array, cand: jax.Array,
                      qrow: jax.Array, valid: jax.Array, k: int,
                      block_cells: int = 8, interpret: bool = False,
                      vmem_limit: int | None = None):
    """(T,C,3) queries vs (T,M,3)-or-per-axis-tuple candidates ->
    (dists (T,C,k), nbrs (T,C,k,3) winner coordinates).

    Same selection semantics as knn_select; see _select_coords_kernel.
    """
    t, c, _ = qpts.shape
    px, py, pz = _axes3(cpts)
    m = px.shape[1]
    pad_t = (-t) % block_cells
    if pad_t:
        qpts = jnp.pad(qpts, ((0, pad_t), (0, 0), (0, 0)))
        px, py, pz = (jnp.pad(a, ((0, pad_t), (0, 0))) for a in (px, py, pz))
        cand = jnp.pad(cand, ((0, pad_t), (0, 0)), constant_values=-2)
        qrow = jnp.pad(qrow, ((0, pad_t), (0, 0)), constant_values=-1)
        valid = jnp.pad(valid, ((0, pad_t), (0, 0)))
    tp = qpts.shape[0]
    grid = (tp // block_cells,)

    b3 = lambda i: (i, 0, 0)
    b2 = lambda i: (i, 0)
    vm = pltpu.VMEM

    dists, nx, ny, nz = pl.pallas_call(
        partial(_select_coords_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
        ],
        out_specs=tuple(
            pl.BlockSpec((block_cells, c, k), b3, memory_space=vm)
            for _ in range(4)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((tp, c, k), jnp.float32) for _ in range(4)),
        interpret=interpret,
        **_compiler_kwargs(vmem_limit),
    )(qpts[..., 0], qpts[..., 1], qpts[..., 2], px, py, pz,
      cand, qrow, valid)
    nbrs = jnp.stack([nx[:t], ny[:t], nz[:t]], axis=-1)
    return dists[:t], nbrs


@partial(jax.jit, static_argnames=("k", "block_cells", "interpret",
                                   "vmem_limit"))
def knn_select(qpts: jax.Array, cpts: jax.Array, cand: jax.Array,
               qrow: jax.Array, valid: jax.Array, k: int,
               block_cells: int = 8, interpret: bool = False,
               vmem_limit: int | None = None):
    """(T,C,3) queries vs (T,M,3)-or-per-axis-tuple candidates ->
    (dists (T,C,k), pos (T,C,k)).

    ``valid``: (T, M) int32 nonzero where the candidate slot is real.
    Rows with fewer than k valid candidates get _INF-backed entries
    (caller detects via isfinite of the returned distance).
    """
    t, c, _ = qpts.shape
    px, py, pz = _axes3(cpts)
    m = px.shape[1]
    pad_t = (-t) % block_cells
    if pad_t:
        qpts = jnp.pad(qpts, ((0, pad_t), (0, 0), (0, 0)))
        px, py, pz = (jnp.pad(a, ((0, pad_t), (0, 0))) for a in (px, py, pz))
        cand = jnp.pad(cand, ((0, pad_t), (0, 0)), constant_values=-2)
        qrow = jnp.pad(qrow, ((0, pad_t), (0, 0)), constant_values=-1)
        valid = jnp.pad(valid, ((0, pad_t), (0, 0)))
    tp = qpts.shape[0]
    grid = (tp // block_cells,)

    b3 = lambda i: (i, 0, 0)
    b2 = lambda i: (i, 0)
    vm = pltpu.VMEM

    dists, pos = pl.pallas_call(
        partial(_select_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((block_cells, c, k), b3, memory_space=vm),
            pl.BlockSpec((block_cells, c, k), b3, memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, c, k), jnp.float32),
            jax.ShapeDtypeStruct((tp, c, k), jnp.int32),
        ),
        interpret=interpret,
        **_compiler_kwargs(vmem_limit),
    )(qpts[..., 0], qpts[..., 1], qpts[..., 2], px, py, pz,
      cand, qrow, valid)
    return dists[:t], pos[:t]
