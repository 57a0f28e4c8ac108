#!/usr/bin/env python
"""Micro-benchmark: does packing P consecutive points per gathered row
speed up the cell-loop candidate fetch on real TPU?

Hypothesis: the XLA row gather is ROW-COUNT-bound (~38M rows at 1M
points, k=20), not byte-bound. Candidates are contiguous 3-cell x-runs,
so P consecutive points can ride one (4·P)-wide row: the row count
drops P× while bytes stay constant (plus ≤P-1 overfetch per run edge).

Run shapes mirror the production cell loop at 1M/k=20: ~100k cells ×
9 runs × run_cap 48.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    N = 1 << 20
    CELLS = 99_968
    RUN = 48
    TILE = 128
    pts = jax.random.normal(jax.random.PRNGKey(0), (N, 4), jnp.float32)
    starts = jax.random.randint(jax.random.PRNGKey(1), (CELLS, 9), 0,
                                N - RUN - 8).astype(jnp.int32)

    def make(pack):
        packed = pts.reshape(N // pack, 4 * pack) if pack > 1 else pts
        groups = RUN // pack + (1 if pack > 1 else 0)

        @jax.jit
        def f(packed, starts):
            def one_tile(st):                     # (T, 9)
                g0 = st // pack
                slot = jnp.arange(groups, dtype=jnp.int32)
                cand = jnp.minimum(g0[..., None] + slot, N // pack - 1)
                cand = cand.reshape(st.shape[0], 9 * groups)
                g = packed[cand]                  # (T, 9*groups, 4*pack)
                # consume like production: reshape to per-point rows
                g = g.reshape(st.shape[0], 9 * groups * pack, 4)
                return jnp.sum(g[..., :3]) + jnp.sum(g[..., 3])
            r = jax.lax.map(one_tile, starts.reshape(-1, TILE, 9))
            return jnp.sum(r)

        return f, packed

    def timeit(f, a, b):
        r = f(a, b)
        np.asarray(r)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r = f(a, b)
            np.asarray(r)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for pack in (1, 2, 4, 8):
        f, packed = make(pack)
        t = timeit(f, packed, starts)
        rows = CELLS * 9 * (RUN // pack + (1 if pack > 1 else 0))
        print(f"pack={pack}: {t*1e3:8.2f} ms   rows={rows/1e6:6.1f}M  "
              f"bytes={rows * 16 * pack / 1e6:7.0f}MB", flush=True)


if __name__ == "__main__":
    main()
