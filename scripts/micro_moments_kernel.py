"""Tiny-shape real-TPU check + timing of the knn_moments kernel alone.

Purpose: validate Mosaic lowering of kernel changes (e.g. the seeded
while_loop bisection) at a cheap shape before paying the 1M pipeline's
multi-minute compile, then time the kernel standalone at a production-
representative tile batch.
"""

import time

import numpy as np

from pct_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pct_tpu.ops.pallas_moments import knn_moments, xla_moment_stats  # noqa: E402


def sync(x):
    np.asarray(x.ravel()[0:1])


def run(t, c, m, k, label, check=True):
    rng = np.random.default_rng(0)
    qpts = jnp.asarray(rng.normal(size=(t, c, 3)).astype(np.float32))
    cpts = jnp.asarray(rng.normal(size=(t, m, 3)).astype(np.float32))
    cand = jnp.asarray(
        rng.integers(0, t * c, size=(t, m)).astype(np.int32))
    qrow = jnp.asarray(
        np.arange(t * c, dtype=np.int32).reshape(t, c))
    valid = jnp.asarray(
        (rng.random((t, m)) < 0.97).astype(np.int32))

    t0 = time.perf_counter()
    out = knn_moments(qpts, cpts, cand, qrow, valid, k)
    sync(out)
    t1 = time.perf_counter()
    print(f"{label}: first call (compile+run) {t1 - t0:.1f} s", flush=True)

    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = knn_moments(qpts, cpts, cand, qrow, valid, k)
        sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: steady {min(ts) * 1e3:.1f} ms", flush=True)

    if check:
        ref = xla_moment_stats(qpts, cpts, cand, qrow, valid, k)
        a, b = np.asarray(out), np.asarray(ref)
        err = np.max(np.abs(a - b) / (1.0 + np.abs(b)))
        print(f"{label}: max rel err vs XLA oracle {err:.2e}", flush=True)
        assert err < 1e-5, err


def main():
    print("devices:", jax.devices(), flush=True)
    # tiny: lowering sanity (fast compile or bust)
    run(4, 8, 256, 20, "tiny(t4,c8,m256,k20)")
    # production-representative k=100 bucket tile shapes (C<=128, M<=3k)
    run(64, 128, 2048, 100, "prod(t64,c128,m2048,k100)", check=False)


if __name__ == "__main__":
    main()
