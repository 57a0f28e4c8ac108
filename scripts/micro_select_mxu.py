#!/usr/bin/env python
"""A/B the coords-select kernel vs an MXU-extraction variant (real TPU).

The production _select_coords_kernel spends ~6 of its ~12 per-round VPU
passes on three masked select-sums (winner x/y/z extraction). The MXU is
idle in that kernel. Variant: per round build sel_f (C,M) once and
contract it against a per-tile (M,4) matrix P = [px,py,pz,candf] on the
MXU — one small dot per tile-row replaces the three where+sum passes
(and gets the winner id for free in column 3).

P is built OUTSIDE the kernel (XLA stack) because forming (M,4) from
(Tp,M) lanes inside the kernel is a banned cross-lane reshape. The
kernel output is (Tp,C,4k) with each round's (C,4) written at static
lane offset 4j; the caller reshapes to (T,C,k,4) and unbinds.

Run AFTER the CPU test suite finishes (timing confound otherwise).
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

_INF = 3.0e38


def _mxu_kernel(qx_ref, qy_ref, qz_ref, px_ref, py_ref, pz_ref,
                pmat_ref, cand_ref, qrow_ref, len_ref,
                dist_ref, out4_ref, *, k: int):
    import jax
    import jax.numpy as jnp

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

    tp = d2.shape[0]
    m = d2.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, dimension=2)
    for j in range(k):
        mn = jnp.min(d2, axis=-1)                    # (Tp, C)
        hit = d2 == mn[:, :, None]
        am = jnp.min(jnp.where(hit, iota, m), axis=-1)   # first argmin
        sel = iota == am[:, :, None]
        self_f = jnp.where(sel, 1.0, 0.0)            # (Tp, C, M)
        dist_ref[:, :, j] = jnp.sqrt(jnp.maximum(mn, 0.0))
        for t in range(tp):
            out = jax.lax.dot_general(
                self_f[t], pmat_ref[t],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (C, 4)
            out4_ref[t, :, 4 * j:4 * j + 4] = out
        d2 = jnp.where(sel, _INF, d2)


def select_coords_mxu(qpts, cpts, cand, qrow, valid, k,
                      block_cells=8, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, c, _ = qpts.shape
    px, py, pz = cpts
    m = px.shape[1]
    candf = cand.astype(jnp.float32)
    pmat = jnp.stack([px, py, pz, candf], axis=-1)   # (T, M, 4) XLA-side
    tp = t
    grid = (tp // block_cells,)
    b3 = lambda i: (i, 0, 0)
    b2 = lambda i: (i, 0)
    vm = pltpu.VMEM

    dists, out4 = pl.pallas_call(
        partial(_mxu_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m, 4), b3, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
            pl.BlockSpec((block_cells, c), b2, memory_space=vm),
            pl.BlockSpec((block_cells, m), b2, memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((block_cells, c, k), b3, memory_space=vm),
            pl.BlockSpec((block_cells, c, 4 * k), b3, memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, c, k), jnp.float32),
            jax.ShapeDtypeStruct((tp, c, 4 * k), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(qpts[..., 0], qpts[..., 1], qpts[..., 2], px, py, pz, pmat,
      cand, qrow, valid)
    o = out4.reshape(tp, c, k, 4)
    nbrs = o[..., :3]
    rows = o[..., 3].astype(jnp.int32)
    return dists, nbrs, rows


def make_inputs(T, C, M, k, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    qp = rng.standard_normal((T, C, 3), np.float32)
    # candidates: each tile's candidates near its queries
    cp = qp[:, rng.integers(0, C, size=M), :] + 0.05 * rng.standard_normal(
        (T, M, 3), np.float32)
    cand = rng.integers(0, 1 << 20, size=(T, M), dtype=np.int32)
    qrow = np.full((T, C), -1, np.int32)  # no self-exclusion hits
    valid = (rng.random((T, M)) < 0.95).astype(np.int32)
    return (jnp.asarray(qp), (jnp.asarray(cp[..., 0]), jnp.asarray(cp[..., 1]),
            jnp.asarray(cp[..., 2])), jnp.asarray(cand), jnp.asarray(qrow),
            jnp.asarray(valid))


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from pct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from pct_tpu.ops.pallas_select import knn_select_coords

    on_cpu = jax.default_backend() == "cpu"
    T, C, M, k = (64, 128, 504, 20) if on_cpu else (8192, 128, 504, 20)
    qp, cp, cand, qrow, valid = make_inputs(T, C, M, k)

    interp = on_cpu
    f_base = jax.jit(partial(knn_select_coords, k=k, interpret=interp))
    f_mxu = jax.jit(partial(select_coords_mxu, k=k, interpret=interp))

    d0, n0 = f_base(qp, cp, cand, qrow, valid)
    d1, n1, _ = f_mxu(qp, cp, cand, qrow, valid)
    # parity on found slots only (missing slots carry arbitrary coords)
    found = np.asarray(d0) < 1e18
    ed = np.abs(np.asarray(d0) - np.asarray(d1))[found].max()
    en = np.abs(np.asarray(n0) - np.asarray(n1))[found].max()
    print(f"parity: max|d|={ed:.3e} max|coords|={en:.3e}", flush=True)
    if on_cpu:
        return

    def timeit(fn, n_out):
        out = fn(qp, cp, cand, qrow, valid)
        np.asarray(out[0][:1, :1, :1])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(qp, cp, cand, qrow, valid)
            np.asarray(out[0][:1, :1, :1])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tb = timeit(f_base, 2)
    tm = timeit(f_mxu, 3)
    q = T * C
    print(f"base : {tb*1e3:8.1f} ms  ({q/tb/1e6:.2f} Mq/s)", flush=True)
    print(f"mxu  : {tm*1e3:8.1f} ms  ({q/tm/1e6:.2f} Mq/s)", flush=True)


if __name__ == "__main__":
    main()
