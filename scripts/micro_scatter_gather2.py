#!/usr/bin/env python
"""A/B: packed row scatter vs (1-col index scatter + row gather) — v2.

Same experiment as micro_scatter_gather.py but ALL data is generated
on-device (jax.random under jit): v1 shipped ~380 MB of host arrays
over the TPU tunnel, which dominated wall-clock before the first
measurement. Shapes model the 1M k=100 moments path (1.29M flat rows,
1.05M destinations) and the k=20 headline (D=11).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def timeit(fn, *args, n=5):
    # Fence with a DEVICE-side slice: np.asarray(o[:1, :1]) moves 4
    # bytes. np.asarray(o).reshape(-1)[:1] would ship the whole (n,D)
    # output (~44-176 MB) over the 0.4s-RTT tunnel every rep and dwarf
    # the scatter-vs-gather delta being measured.
    o = fn(*args)
    np.asarray(o[:1, :1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        o = fn(*args)
        np.asarray(o[:1, :1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from pct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    rows, n = 1_294_336, 1_048_576

    @jax.jit
    def make_dest(key):
        # n real destinations (a permutation of [0,n)) spread over the
        # rows slots; the rest drop (dest == n), like padded tile rows
        vals = jnp.concatenate([
            jax.random.permutation(key, n).astype(jnp.int32),
            jnp.full((rows - n,), n, jnp.int32)])
        return jax.random.permutation(jax.random.fold_in(key, 1), vals)

    dest = make_dest(jax.random.PRNGKey(0))

    for d in (11, 13, 42):
        slab = jax.jit(
            lambda: jax.random.normal(jax.random.PRNGKey(d), (rows, d),
                                      jnp.float32))()

        @jax.jit
        def scatter_d(slab, dest):
            out = jnp.zeros((n, slab.shape[1]), jnp.float32)
            return out.at[dest].set(slab, mode="drop")

        @jax.jit
        def inv_gather(slab, dest):
            ridx = jnp.zeros((n,), jnp.int32).at[dest].set(
                jnp.arange(slab.shape[0], dtype=jnp.int32) + 1, mode="drop")
            src = jnp.where(ridx > 0, ridx - 1, slab.shape[0])
            return jnp.take(slab, src, axis=0, mode="fill", fill_value=0.0)

        err = jax.jit(lambda s, de: jnp.max(jnp.abs(
            scatter_d(s, de) - inv_gather(s, de))))(slab, dest)
        print(f"D={d}: max|a-b| = {float(err):.3g}", flush=True)
        ta = timeit(scatter_d, slab, dest)
        tb = timeit(inv_gather, slab, dest)
        print(f"D={d}: scatter {ta*1e3:7.1f} ms   inv+gather {tb*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
