#!/usr/bin/env python
"""Micro: moment->curvature epilogue variants at 1M on the real TPU.

rotation = tensor contractions (trailing-3 intermediates, (4,128)
tiling waste) vs the symbolic per-term expansion (pure lane-major
scalar ops), each at two chunk sizes. Also cross-checks the two
rotations agree numerically.
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

    from pct_tpu.fit.moments import curvature_from_moments_chunked

    N = 1 << 20
    rng = np.random.default_rng(0)
    # realistic-ish moments: build from actual small neighborhoods
    k = 32
    r = rng.standard_normal((N, k, 3)).astype(np.float32) * 0.01
    r[..., 2] *= 0.1
    sigma = np.linalg.norm(r, axis=-1).max(axis=-1)
    from pct_tpu.fit.moments import neighborhood_moments

    m_np = np.zeros((N, 35), np.float32)
    CH = 1 << 17
    for i in range(0, N, CH):
        m_np[i:i + CH] = np.asarray(neighborhood_moments(
            jnp.asarray(r[i:i + CH]), jnp.ones((CH, k), jnp.float32),
            jnp.asarray(sigma[i:i + CH])))
    m = jnp.asarray(m_np)
    sig = jnp.asarray(sigma)
    nearest = jnp.asarray(r[:, 0, :])
    kth = jnp.asarray(r[:, -1, :])

    outs = {}
    for rot in ("contraction", "symbolic"):
        for chunk in (16384, 65536):
            fn = jax.jit(partial(curvature_from_moments_chunked,
                                 chunk=chunk, rotation=rot))
            t0 = time.perf_counter()
            curv, nrm = fn(m, sig, nearest, kth)
            np.asarray(curv.K[:1])
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                curv, nrm = fn(m, sig, nearest, kth)
                np.asarray(curv.K[:1])
                ts.append(time.perf_counter() - t0)
            outs[(rot, chunk)] = np.asarray(curv.K)
            print(f"{rot:12s} chunk={chunk:6d}  {min(ts)*1e3:8.1f} ms  "
                  f"(first call incl compile {compile_s:6.1f} s)",
                  flush=True)

    a = outs[("contraction", 16384)]
    b = outs[("symbolic", 16384)]
    scale = np.abs(a).max()
    print("sym-vs-contraction: median", np.median(np.abs(a - b)) / scale,
          "p99", np.quantile(np.abs(a - b) / scale, 0.99))


if __name__ == "__main__":
    main()
