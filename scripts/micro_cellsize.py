#!/usr/bin/env python
"""Variants of the sampled 1-NN mean (estimate_cell_size's cost) on TPU.

The estimator is ~33-57 ms of the 610 ms headline (it runs INSIDE the
timed end-to-end step: a production caller estimates per cloud). This
times exact/approximate variants to pick a cheaper formulation.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from pct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from functools import partial

    from pct_tpu.core import from_numpy
    from pct_tpu.shapes import generate_shape

    N = 1_000_000
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)
    p, npts = cloud.points, cloud.num_points
    n = p.shape[0]

    def timeit(fn, *args):
        out = fn(*args)
        np.asarray(out).reshape(-1)[:1]
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(out).reshape(-1)[:1]
            ts.append(time.perf_counter() - t0)
        return min(ts), float(np.asarray(out).reshape(-1)[0])

    def fold(points, num_points, sample, chunk, dtype=jnp.float32):
        stride = jnp.maximum(num_points // sample, 1)
        sidx = (jnp.arange(sample, dtype=jnp.int32) * stride) % jnp.maximum(
            num_points, 1)
        s = points[sidx].astype(dtype)
        valid_s = jnp.arange(sample) < jnp.minimum(sample, num_points)
        pad = (-n) % chunk
        ptsp = jnp.pad(points, ((0, pad), (0, 0)),
                       constant_values=2e9).astype(dtype)
        base_valid = jnp.arange(n + pad, dtype=jnp.int32) < num_points

        def body(carry, args):
            best = carry
            pc, v, gidx = args
            d2 = ((s[:, None, 0] - pc[None, :, 0]) ** 2
                  + (s[:, None, 1] - pc[None, :, 1]) ** 2
                  + (s[:, None, 2] - pc[None, :, 2]) ** 2)
            big = jnp.asarray(3e38, dtype)
            d2 = jnp.where(v[None, :], d2, big)
            own = gidx[None, :] == sidx[:, None]
            d2 = jnp.where(own, big, d2)
            return jnp.minimum(best, jnp.min(d2, axis=1)), None

        chunks = ptsp.reshape(-1, chunk, 3)
        vchunks = base_valid.reshape(-1, chunk)
        gi = jnp.arange(n + pad, dtype=jnp.int32).reshape(-1, chunk)
        best, _ = jax.lax.scan(body, jnp.full((sample,), big_val(dtype)),
                               (chunks, vchunks, gi))
        best = jnp.sqrt(best.astype(jnp.float32))
        best = jnp.where(valid_s, best, 0.0)
        return jnp.sum(best) / jnp.maximum(jnp.sum(valid_s), 1)

    def big_val(dtype):
        return 3e38 if dtype == jnp.float32 else 3e38

    # current production path
    from pct_tpu.neighbors.bruteforce import mean_nn_distance

    t, v = timeit(jax.jit(lambda p, np_: mean_nn_distance(
        p, np_, sample=512, chunk=65536)), p, npts)
    print(f"current (512/65536, f32):   {t*1e3:7.1f} ms  dbar={v:.6f}",
          flush=True)

    for sample, chunk, dt, name in (
            (512, 65536, jnp.float32, "rewrite f32 512/65536"),
            (512, 262144, jnp.float32, "rewrite f32 512/262144"),
            (512, 1048576, jnp.float32, "rewrite f32 512/1M"),
            (512, 65536, jnp.bfloat16, "rewrite bf16 512/65536"),
            (512, 262144, jnp.bfloat16, "rewrite bf16 512/262144"),
            (256, 65536, jnp.float32, "rewrite f32 256/65536"),
            (1024, 262144, jnp.float32, "rewrite f32 1024/262144"),
    ):
        f = jax.jit(partial(fold, sample=sample, chunk=chunk, dtype=dt))
        t, v = timeit(f, p, npts)
        print(f"{name:27s} {t*1e3:7.1f} ms  dbar={v:.6f}", flush=True)


if __name__ == "__main__":
    main()
