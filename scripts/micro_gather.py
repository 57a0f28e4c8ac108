#!/usr/bin/env python
"""Micro-benchmark: row-by-row gather vs contiguous-run dynamic-slice
gather for the cell-loop candidate fetch, on real TPU."""

import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pct_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    N = 1 << 20
    CELLS = 99_968  # multiple of 128
    RUN = 48
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (N, 3), jnp.float32)
    starts = jax.random.randint(jax.random.PRNGKey(1), (CELLS, 9), 0,
                                N - RUN).astype(jnp.int32)

    TILE = 128

    @jax.jit
    def rowgather(pts, starts):
        def one_tile(st):                     # (T, 9)
            slot = jnp.arange(RUN, dtype=jnp.int32)
            cand = jnp.minimum(st[..., None] + slot, N - 1)
            cand = cand.reshape(st.shape[0], 9 * RUN)
            return jnp.sum(pts[cand])
        r = jax.lax.map(one_tile, starts.reshape(-1, TILE, 9))
        return jnp.sum(r)

    @jax.jit
    def slicegather(pts, starts):
        def one_tile(st):
            def slice_one(s):
                return jax.lax.dynamic_slice(pts, (s, 0), (RUN, 3))
            runs = jax.vmap(jax.vmap(slice_one))(st)   # (T, 9, RUN, 3)
            return jnp.sum(runs)
        r = jax.lax.map(one_tile, starts.reshape(-1, TILE, 9))
        return jnp.sum(r)

    @jax.jit
    def slicegather_planes(pts, starts):
        px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
        def one_tile(st):
            def slice_one(s):
                return (jax.lax.dynamic_slice(px, (s,), (RUN,)),
                        jax.lax.dynamic_slice(py, (s,), (RUN,)),
                        jax.lax.dynamic_slice(pz, (s,), (RUN,)))
            a, b, c = jax.vmap(jax.vmap(slice_one))(st)
            return jnp.sum(a) + jnp.sum(b) + jnp.sum(c)
        r = jax.lax.map(one_tile, starts.reshape(-1, TILE, 9))
        return jnp.sum(r)

    def timeit(f):
        r = f(pts, starts); np.asarray(r)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(pts, starts))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    print(f"row gather:          {timeit(rowgather)*1e3:8.1f} ms")
    print(f"slice gather (N,3):  {timeit(slicegather)*1e3:8.1f} ms")
    print(f"slice gather planes: {timeit(slicegather_planes)*1e3:8.1f} ms")
    print("vals:", float(rowgather(pts, starts)),
          float(slicegather(pts, starts)))


if __name__ == "__main__":
    main()
