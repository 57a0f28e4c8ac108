#!/usr/bin/env python
"""Minimal repro: cold Mosaic kernel compile INSIDE a big XLA program
vs the same kernel pre-compiled standalone first (VERDICT r3 item 7).

Background: the 1M k=100 moments pipeline's whole-program XLA compile
never finished (>50 min, reproduced 4x) when its Pallas kernels were
cold, while the identical program compiled in ~30 s when each kernel
had been compiled once standalone in-process beforehand
(pipeline/fused.py:_prime_moment_kernels). This script reproduces the
effect with a ~100-line kernel so it is an engineering fact, not a
superstition.

Design: one Pallas kernel with the moment kernel's structural features
(odd 266 sublane extent — measured 113 s standalone in round 2 — plus a
fori_loop chunk scan) inside a program padded with extra fusion work.
Mosaic's kernel cache is IN-PROCESS, so the two protocols need two
invocations (each with its own throwaway persistent-cache dir so every
compile is genuinely cold):

  python scripts/repro_mosaic_cold.py prog-first
      A. whole program, kernel COLD   (the pathological case)
      C. variant program, kernel WARM (in-process Mosaic cache hit)
  python scripts/repro_mosaic_cold.py kernel-first
      B. kernel standalone, COLD      (the Mosaic cost in isolation)
      A'. whole program, kernel WARM  (= the priming protocol)

If A >> B + A' the priming workaround is justified; record the numbers
in CLAUDE.md and keep priming. Run on the real TPU with a clean compile
queue; budget 45+ min and NEVER kill mid-compile.

MEASURED (v5e, round 4, clean queue): this SIMPLE kernel does NOT
reproduce the pathology — prog-first A=2.1 s vs C=1.7 s (0.5 s
cold-in-program delta), kernel-first B=1.7 s + A'=2.2 s. Negative
result, on purpose kept: it bounds the pathology to the REAL kernels'
complexity class (the moment kernel's unrolled bisection rounds +
multi-bucket statics; the select kernel's k unrolled argmin rounds),
not to Pallas-in-big-XLA per se. The live round-4 evidence for the
heavy class: an unprobed (64,144,50)/M=4016 select compiled for 34 min
inside XLA then died with a scoped-VMEM OOM, and the k=100 moment
kernels cold-in-program never finished >50 min (4x, round 2) while
priming makes the same program compile in ~30 s. Priming stays
(pipeline/fused.py:_prime_moment_kernels), with this bound recorded.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="mosaic_cold_")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

C = 266          # hostile sublane extent (non-multiple of 8)
M = 1024
TILES = 8
CHUNK = 256


def _kernel(x_ref, y_ref, o_ref):
    o_ref[...] = jnp.zeros_like(o_ref)
    xb = x_ref[0]                                    # (C, CHUNK)

    def body(j, _):
        sl = y_ref[0, pl.ds(j * CHUNK, CHUNK), :]    # (CHUNK, CHUNK)
        d = jnp.dot(xb, sl.T, preferred_element_type=jnp.float32)
        stats = [jnp.sum(d, axis=1, keepdims=True),
                 jnp.max(d, axis=1, keepdims=True),
                 jnp.sum(d * d, axis=1, keepdims=True),
                 jnp.max(jnp.abs(d), axis=1, keepdims=True)]
        o_ref[0] += jnp.concatenate(
            [jnp.broadcast_to(t, (C, 32)) for t in stats], axis=1)
        return 0

    jax.lax.fori_loop(0, M // CHUNK, body, 0)


def moments_like(x, y):
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], C, 128), jnp.float32),
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, C, CHUNK), lambda t: (t, 0, 0)),
                  pl.BlockSpec((1, M, CHUNK), lambda t: (t, 0, 0))],
        out_specs=pl.BlockSpec((1, C, 128), lambda t: (t, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, y)


def big_program(x, y):
    # surrounding fusion soup: enough HLO that XLA's pass pipeline has
    # real work beyond the custom call (mirrors the 1M pipeline's
    # prologue/epilogue around the kernel)
    for i in range(24):
        x = x * (1.0 + 1e-6 * i) + jnp.roll(x, i % 3, axis=-1) * 1e-7
    stats = moments_like(x, y)
    z = stats[..., 0] - stats[..., 32] + stats[..., 64] * 1e-9
    for i in range(24):
        z = jnp.tanh(z * (1.0 - 1e-6 * i)) + 1e-8 * jnp.cumsum(z, axis=-1)
    return jnp.sum(z), stats


def main(order: str):
    print("cache dir:", os.environ["JAX_COMPILATION_CACHE_DIR"], flush=True)
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(k, (TILES, C, CHUNK)))(key)
    y = jax.jit(lambda k: jax.random.normal(k, (TILES, M, CHUNK)))(
        jax.random.fold_in(key, 1))
    np.asarray(x[:1, :1, :1])

    def timed(tag, fn):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:8.1f} s", flush=True)
        return dt

    if order == "prog-first":
        t_a = timed("A  whole-program, Mosaic COLD",
                    lambda: jax.jit(big_program)(x, y))

        def big_program2(x, y):
            s, stats = big_program(x, y)
            return s + 1.0, stats

        t_c = timed("C  variant program, Mosaic WARM",
                    lambda: jax.jit(big_program2)(x, y))
        print(f"verdict: cold-in-program pays {t_a - t_c:.1f} s over warm",
              flush=True)
    elif order == "kernel-first":
        t_b = timed("B  kernel standalone, COLD",
                    lambda: jax.jit(moments_like)(x, y))
        t_a2 = timed("A' whole-program, Mosaic WARM (priming protocol)",
                     lambda: jax.jit(big_program)(x, y))
        print(f"verdict: primed total = {t_b + t_a2:.1f} s "
              f"(standalone {t_b:.1f} + program {t_a2:.1f})", flush=True)
    else:
        raise SystemExit("usage: repro_mosaic_cold.py prog-first|kernel-first")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "prog-first")
