"""TPU probe: the round-4 scoped-VMEM OOM static must now compile+run.

Round-4 failure (sweep_r4_200k_perturbed.csv, cylinder/torus Perturbed
r=10): knn_select_rows at (tile=128, C=192..208, k=50), M~1600 — Mosaic
scoped allocation 21.51M > 16.00M. The select plan
(cellknn._select_plan) now raises vmem_limit_bytes for this class.
This probe compiles the EXACT kernel static with the planned
(block_cells, vmem_limit) and runs it on synthetic on-device data
(jax.random under jit — never ship host arrays over the tunnel,
CLAUDE.md). Also times a plan-free baseline expectation: nothing to
compare against (the old build OOMs), so the gate is simply
compile-success + finite outputs + sane monotone distances.

Run on the real TPU:  python scripts/probe_vmem_fix.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from pct_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    from pct_tpu.neighbors.cellknn import _select_plan
    from pct_tpu.ops.pallas_select import knn_select_rows

    for (C, M, K) in [(192, 1600, 50), (208, 1600, 50)]:
        T = 128
        block, limit = _select_plan(C, M, K)
        print(f"static (T={T}, C={C}, M={M}, k={K}) -> plan block={block} "
              f"vmem_limit={limit and limit >> 20}MB", flush=True)

        @jax.jit
        def make(key):
            kq, kp = jax.random.split(key)
            q = jax.random.uniform(kq, (T, C, 3), jnp.float32)
            p = jax.random.uniform(kp, (T, M, 3), jnp.float32)
            cand = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)
            qrow = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1) + M
            valid = jnp.ones((T, M), jnp.int32)
            return q, p, cand, qrow, valid

        args = make(jax.random.PRNGKey(0))
        t0 = time.time()
        d, r = knn_select_rows(*args, K, block_cells=block,
                               vmem_limit=limit)
        d0 = np.asarray(d[:1, :1])          # reliable fence (CLAUDE.md)
        t1 = time.time()
        d, r = knn_select_rows(*args, K, block_cells=block,
                               vmem_limit=limit)
        _ = np.asarray(d[:1, :1])
        t2 = time.time()
        dn = np.asarray(d)
        assert np.isfinite(dn).all(), "non-finite select distances"
        # near-ties can emit in swapped order (1-ulp FMA divergence
        # between the kernel's min-reduce and its equality compare —
        # measured 2 swaps in 1.2M entries, winner SET exact vs oracle),
        # so monotonicity is gated with a relative slack
        drop = np.diff(dn, axis=-1)
        assert (drop >= -1e-5 * dn[..., 1:]).all(), "non-monotone distances"
        rn = np.asarray(r)
        assert ((rn >= 0) & (rn < M)).all(), "row ids out of range"
        print(f"  OK compile+run {t1 - t0:.1f} s, warm {t2 - t1:.3f} s, "
              f"d[0,0,0]={dn[0, 0, 0]:.4f}", flush=True)
    print("probe_vmem_fix: ALL OK", flush=True)


if __name__ == "__main__":
    main()
