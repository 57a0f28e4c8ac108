"""Stage-isolation timing of the knn_moments kernel at production shapes.

The k=100 1M-torus moments pipeline spends ~487 ms in the kernel across
three buckets of (capacity C, run_cap M, tiles T) = (56,168,11776),
(72,216,7680), (120,312,4096) — roughly 1 ns per (query,candidate)
pair, ~20x off VPU speed-of-light. This script times a parametrized
copy of the kernel with stages disabled (static `mode`) and with `tb`
cell tiles batched per pallas program, to locate the cost:

  full        production semantics (tb=1 must match ops.pallas_moments)
  fixed26     bisection as fori_loop(26) — no per-round while cond
  quad        4-ary bisection (3 probes per scratch scan, ~13 rounds)
  quad_fixed  4-ary as fori_loop(14) — no while cond
  oct_fixed   8-ary as fori_loop(10) — 7 probes per scan
  interp4     4 false-position probes (cnt(t) ~ linear in t on a
              2-manifold) + adaptive binary finish
  no_bisect   tau := max valid d2 (zero bisection rounds)
  no_moments  skip the 35-monomial pass
  no_am       skip the nearest/kth argmin pass
  d2_only     d2 scratch fill + one count pass only

Multi-ary correctness: counts are monotone in the threshold, so the
probe chain preserves the bracket invariant cnt(lo) < k <= cnt(hi);
mids computed as lo + i*((hi-lo)//arity) never overflow int32 (hi is a
positive-f32 bit pattern < 2^31).

tb>1 generalizes the scratch to (g, tb, C, chunk) and the grid to
(T/tb,): same math per row, so outputs are bit-identical to tb=1 (the
while cond spans the batch, but converged rows are fixpoints).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from pct_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from functools import partial  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from pct_tpu.fit.moments import MOMENT_EXPS  # noqa: E402
from pct_tpu.ops.pallas_moments import NOUT, _SENT, _SENT_BITS, knn_moments  # noqa: E402
from pct_tpu.ops.pallas_select import _axes3  # noqa: E402


def _kernel(qx_ref, qy_ref, qz_ref, px_ref, py_ref, pz_ref,
            cand_ref, qrow_ref, len_ref, out_ref, d2i_ref,
            *, k: int, mode: str):
    qx, qy, qz = qx_ref[:, 0], qy_ref[:, 0], qz_ref[:, 0]    # (tb, C)
    qrow = qrow_ref[:, 0]
    tb, c = qx.shape
    g_chunks = px_ref.shape[1]
    chunk = px_ref.shape[3]

    def d2_body(g, carry):
        mn, mx = carry
        px = px_ref[:, g, 0, :]                              # (tb, chunk)
        py = py_ref[:, g, 0, :]
        pz = pz_ref[:, g, 0, :]
        dx = qx[:, :, None] - px[:, None, :]
        dy = qy[:, :, None] - py[:, None, :]
        dz = qz[:, :, None] - pz[:, None, :]
        d2 = dx * dx + dy * dy + dz * dz                     # (tb, C, chunk)
        ok = ((len_ref[:, g, 0, :][:, None, :] > 0)
              & (cand_ref[:, g, 0, :][:, None, :] != qrow[:, :, None]))
        bits = pltpu.bitcast(jnp.where(ok, d2, _SENT), jnp.int32)
        d2i_ref[g] = bits
        mn = jnp.minimum(mn, jnp.min(bits, axis=-1))
        mx = jnp.maximum(mx, jnp.max(
            jnp.where(bits == _SENT_BITS, -1, bits), axis=-1))
        return mn, mx

    mn, mx = jax.lax.fori_loop(
        0, g_chunks, d2_body,
        (jnp.full((tb, c), _SENT_BITS, jnp.int32),
         jnp.full((tb, c), -1, jnp.int32)))

    def count_le_fn(thresh):
        def body(g, cnt):
            return cnt + jnp.sum(
                (d2i_ref[g] <= thresh[:, :, None]).astype(jnp.int32),
                axis=-1)

        return jax.lax.fori_loop(0, g_chunks, body,
                                 jnp.zeros((tb, c), jnp.int32))

    hi0 = jnp.maximum(mx, 0)
    lo0 = jnp.minimum(mn - 1, hi0)

    def countmulti_fn(threshs):
        # counts for several thresholds in ONE scratch scan
        def body(g, cnts):
            d = d2i_ref[g]
            return tuple(
                c + jnp.sum((d <= t[:, :, None]).astype(jnp.int32), axis=-1)
                for c, t in zip(cnts, threshs))

        return jax.lax.fori_loop(
            0, g_chunks, body,
            tuple(jnp.zeros((tb, c), jnp.int32) for _ in threshs))

    def nary_round(carry, arity):
        lo, hi = carry
        # q >= 1 and probes clamped to hi: progress is guaranteed even
        # for tiny brackets (q=0 would re-probe lo forever); a probe at
        # hi is redundant-but-harmless (cnt(hi) >= k by invariant)
        q = jnp.maximum((hi - lo) // arity, 1)
        mids = [jnp.minimum(lo + i * q, hi) for i in range(1, arity)]
        cnts = countmulti_fn(mids)
        new_lo, new_hi = lo, hi
        # bracket the k-th count crossing: counts are monotone in the
        # threshold, so ~ge probes are a prefix and ge probes a suffix
        for m_, c_ in zip(mids, cnts):
            ge = c_ >= k
            new_hi = jnp.where(ge, jnp.minimum(new_hi, m_), new_hi)
            new_lo = jnp.where(~ge, jnp.maximum(new_lo, m_), new_lo)
        return new_lo, new_hi

    if mode == "no_bisect" or mode == "d2_only":
        tau_bits = hi0
    elif mode == "fixed26":
        def bisect_f(_, carry):
            lo, hi = carry
            mid = lo + (hi - lo) // 2
            ge = count_le_fn(mid) >= k
            return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

        _, tau_bits = jax.lax.fori_loop(0, 26, bisect_f, (lo0, hi0))
    elif mode == "quad":
        def quad_cond(carry):
            lo, hi = carry
            return jnp.max(hi - lo) > 1

        _, tau_bits = jax.lax.while_loop(
            quad_cond, lambda c: nary_round(c, 4), (lo0, hi0))
    elif mode == "quad_fixed":
        _, tau_bits = jax.lax.fori_loop(
            0, 14, lambda _, c: nary_round(c, 4), (lo0, hi0))
    elif mode == "oct_fixed":
        _, tau_bits = jax.lax.fori_loop(
            0, 10, lambda _, c: nary_round(c, 8), (lo0, hi0))
    elif mode == "interp4":
        # cnt(t) grows ~linearly in the d2 threshold t near a surface
        # point (2-manifold: area within radius r ~ pi r^2 = pi t), so
        # false position brackets the kth crossing in a few probes;
        # bits<->float interp is monotone for positive f32 patterns.
        cnt_lo0 = jnp.zeros((tb, c), jnp.int32)          # cnt(mn-1) == 0
        cnt_hi0 = count_le_fn(hi0)

        def fp_round(_, carry):
            lo, hi, cl, ch = carry
            tlo = pltpu.bitcast(jnp.maximum(lo, 0), jnp.float32)
            thi = pltpu.bitcast(hi, jnp.float32)
            denom = jnp.maximum((ch - cl).astype(jnp.float32), 1.0)
            tg = tlo + (thi - tlo) * ((k - cl).astype(jnp.float32) / denom)
            gb = pltpu.bitcast(tg, jnp.int32)
            gb = jnp.clip(gb, lo + 1, jnp.maximum(hi - 1, lo + 1))
            cg = count_le_fn(gb)
            ge = cg >= k
            return (jnp.where(ge, lo, gb), jnp.where(ge, gb, hi),
                    jnp.where(ge, cl, cg), jnp.where(ge, cg, ch))

        lo1, hi1, _, _ = jax.lax.fori_loop(
            0, 4, fp_round, (lo0, hi0, cnt_lo0, cnt_hi0))

        def bisect_cond(carry):
            lo, hi = carry
            return jnp.max(hi - lo) > 1

        def bisect(carry):
            lo, hi = carry
            mid = lo + (hi - lo) // 2
            ge = count_le_fn(mid) >= k
            return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

        _, tau_bits = jax.lax.while_loop(bisect_cond, bisect, (lo1, hi1))
    else:
        def bisect_cond(carry):
            lo, hi = carry
            return jnp.max(hi - lo) > 1

        def bisect(carry):
            lo, hi = carry
            mid = lo + (hi - lo) // 2
            ge = count_le_fn(mid) >= k
            return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

        _, tau_bits = jax.lax.while_loop(bisect_cond, bisect, (lo0, hi0))

    tau_b = tau_bits[:, :, None]
    count_le = count_le_fn(tau_bits)
    if mode == "d2_only":
        out_ref[:, :, 0] = count_le.astype(jnp.float32)
        for i in range(1, NOUT):
            out_ref[:, :, i] = jnp.zeros((tb, c), jnp.float32)
        return
    count_lt = count_le_fn(tau_bits - 1)
    found = count_le >= k

    if mode == "no_am":
        big0 = jnp.full((tb, c), g_chunks * chunk, jnp.int32)
        am_n, am_k = big0, big0
    else:
        def am_body(g, carry):
            am_n, am_k = carry
            d2c = d2i_ref[g]
            iota_c = g * chunk + jax.lax.broadcasted_iota(
                jnp.int32, (tb, c, chunk), dimension=2)
            big = g_chunks * chunk
            am_n = jnp.minimum(am_n, jnp.min(
                jnp.where(d2c == mn[:, :, None], iota_c, big), axis=-1))
            am_k = jnp.minimum(am_k, jnp.min(
                jnp.where(d2c == tau_b, iota_c, big), axis=-1))
            return am_n, am_k

        big0 = jnp.full((tb, c), g_chunks * chunk, jnp.int32)
        am_n, am_k = jax.lax.fori_loop(0, g_chunks, am_body, (big0, big0))

    tau = pltpu.bitcast(tau_bits, jnp.float32)
    sigma = jnp.sqrt(jnp.maximum(tau, 0.0))
    inv_sig = 1.0 / jnp.maximum(sigma, 1e-30)
    count_eq = jnp.maximum(count_le - count_lt, 1)
    w_tie = jnp.clip((k - count_lt).astype(jnp.float32)
                     / count_eq.astype(jnp.float32), 0.0, 1.0)

    nm = len(MOMENT_EXPS)
    zero = jnp.zeros((tb, c), jnp.float32)

    if mode == "no_moments":
        accs = tuple(zero for _ in range(nm))
        near = kth = (zero,) * 3
    else:
        def mom_body(g, carry):
            accs, near, kth = carry
            px = px_ref[:, g, 0, :]
            py = py_ref[:, g, 0, :]
            pz = pz_ref[:, g, 0, :]
            rx = px[:, None, :] - qx[:, :, None]
            ry = py[:, None, :] - qy[:, :, None]
            rz = pz[:, None, :] - qz[:, :, None]
            d2c = d2i_ref[g]
            iota_c = g * chunk + jax.lax.broadcasted_iota(
                jnp.int32, (tb, c, chunk), dimension=2)
            w = (jnp.where(d2c < tau_b, 1.0, 0.0)
                 + jnp.where(d2c == tau_b, 1.0, 0.0) * w_tie[:, :, None])
            xh = jnp.clip(rx * inv_sig[:, :, None], -2.0, 2.0)
            yh = jnp.clip(ry * inv_sig[:, :, None], -2.0, 2.0)
            zh = jnp.clip(rz * inv_sig[:, :, None], -2.0, 2.0)
            monos = {}
            new_accs = []
            for i, (a, b, cc) in enumerate(MOMENT_EXPS):
                if (a, b, cc) == (0, 0, 0):
                    mono = w
                elif a > 0:
                    mono = monos[(a - 1, b, cc)] * xh
                elif b > 0:
                    mono = monos[(a, b - 1, cc)] * yh
                else:
                    mono = monos[(a, b, cc - 1)] * zh
                monos[(a, b, cc)] = mono
                new_accs.append(accs[i] + jnp.sum(mono, axis=-1))
            sn = (iota_c == am_n[:, :, None]).astype(jnp.float32)
            sk = (iota_c == am_k[:, :, None]).astype(jnp.float32)
            new_near = tuple(near[j] + jnp.sum(sn * r, axis=-1)
                             for j, r in enumerate((rx, ry, rz)))
            new_kth = tuple(kth[j] + jnp.sum(sk * r, axis=-1)
                            for j, r in enumerate((rx, ry, rz)))
            return tuple(new_accs), new_near, new_kth

        accs, near, kth = jax.lax.fori_loop(
            0, g_chunks, mom_body,
            (tuple(zero for _ in range(nm)), (zero,) * 3, (zero,) * 3))

    for i in range(nm):
        out_ref[:, :, i] = accs[i]
    out_ref[:, :, 35] = tau
    out_ref[:, :, 36] = count_lt.astype(jnp.float32)
    out_ref[:, :, 37] = count_le.astype(jnp.float32)
    out_ref[:, :, 38] = sigma
    for j in range(3):
        out_ref[:, :, 39 + j] = near[j]
        out_ref[:, :, 42 + j] = jnp.where(found, kth[j], 0.0)
    out_ref[:, :, 45] = found.astype(jnp.float32)
    out_ref[:, :, 46] = jnp.zeros((tb, c), jnp.float32)
    out_ref[:, :, 47] = jnp.zeros((tb, c), jnp.float32)


@partial(jax.jit,
         static_argnames=("k", "tb", "chunk", "mode", "interpret"))
def moments_variant(qpts, cpts, cand, qrow, valid, k: int, tb: int = 1,
                    chunk: int = 1024, mode: str = "full",
                    interpret: bool = False):
    t, c, _ = qpts.shape
    pad_c = (-c) % 8
    if pad_c:
        qpts = jnp.pad(qpts, ((0, 0), (0, pad_c), (0, 0)))
        qrow = jnp.pad(qrow, ((0, 0), (0, pad_c)), constant_values=-1)
    cp = c + pad_c
    px, py, pz = _axes3(cpts)
    m = px.shape[1]
    chunk = min(chunk, ((m + 127) // 128) * 128)
    pad_m = (-m) % chunk
    if pad_m:
        px, py, pz = (jnp.pad(a, ((0, 0), (0, pad_m)))
                      for a in (px, py, pz))
        cand = jnp.pad(cand, ((0, 0), (0, pad_m)), constant_values=-2)
        valid = jnp.pad(valid, ((0, 0), (0, pad_m)))
    mp = m + pad_m
    g = mp // chunk
    pad_t = (-t) % tb
    if pad_t:
        qpts = jnp.pad(qpts, ((0, pad_t), (0, 0), (0, 0)))
        qrow = jnp.pad(qrow, ((0, pad_t), (0, 0)), constant_values=-1)
        px, py, pz, cand, valid = (
            jnp.pad(a, ((0, pad_t), (0, 0)))
            for a in (px, py, pz, cand, valid))
    tp = t + pad_t
    grid = (tp // tb,)

    b3 = lambda i: (i, 0, 0)
    b4 = lambda i: (i, 0, 0, 0)
    vm = pltpu.VMEM
    cspec = pl.BlockSpec((tb, 1, cp), b3, memory_space=vm)
    gspec = pl.BlockSpec((tb, g, 1, chunk), b4, memory_space=vm)

    def as_g(a):
        return a.reshape(tp, g, 1, chunk)

    out = pl.pallas_call(
        partial(_kernel, k=k, mode=mode),
        grid=grid,
        in_specs=[cspec, cspec, cspec, gspec, gspec, gspec, gspec, cspec,
                  gspec],
        out_specs=pl.BlockSpec((tb, cp, NOUT), b3, memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((tp, cp, NOUT), jnp.float32),
        scratch_shapes=[pltpu.VMEM((g, tb, cp, chunk), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qpts[:, None, :, 0], qpts[:, None, :, 1], qpts[:, None, :, 2],
      as_g(px), as_g(py), as_g(pz),
      as_g(cand), qrow[:, None, :], as_g(valid))
    return out[:t, :c]


def sync(x):
    np.asarray(x.ravel()[0:1])


def make_args(t, c, m, seed=0):
    rng = np.random.default_rng(seed)
    qpts = jnp.asarray(rng.normal(size=(t, c, 3)).astype(np.float32))
    cpts = jnp.asarray(rng.normal(size=(t, m, 3)).astype(np.float32))
    cand = jnp.asarray(rng.integers(0, t * c, size=(t, m)).astype(np.int32))
    qrow = jnp.asarray(np.arange(t * c, dtype=np.int32).reshape(t, c))
    valid = jnp.asarray((rng.random((t, m)) < 0.97).astype(np.int32))
    return qpts, cpts, cand, qrow, valid


def time_fn(fn, label):
    t0 = time.perf_counter()
    out = fn()
    sync(out)
    t1 = time.perf_counter()
    ts = []
    for _ in range(5):
        t0b = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0b)
    print(f"  {label:24s} steady {min(ts)*1e3:7.1f} ms   "
          f"(first {t1-t0:5.1f} s)", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    k = 100
    buckets = [(11776, 56, 168), (7680, 72, 216), (4096, 120, 312)]
    for t, c, m in buckets:
        print(f"bucket t={t} c={c} m={m} k={k}", flush=True)
        args = make_args(t, c, m)
        base = time_fn(lambda: knn_moments(*args, k), "prod knn_moments")
        full1 = time_fn(lambda: moments_variant(*args, k, tb=1,
                                                mode="full"), "full tb=1")
        d = np.max(np.abs(np.asarray(base) - np.asarray(full1)))
        print(f"  full tb=1 vs prod max abs diff {d:.2e}", flush=True)
        for mode in ("fixed26", "no_bisect", "no_moments", "no_am",
                     "d2_only"):
            time_fn(lambda m_=mode: moments_variant(*args, k, tb=1,
                                                    mode=m_), mode)
        for tb in (4, 8, 16):
            out = time_fn(lambda tb_=tb: moments_variant(*args, k, tb=tb_,
                                                         mode="full"),
                          f"full tb={tb}")
            d = np.max(np.abs(np.asarray(base) - np.asarray(out)))
            print(f"  full tb={tb} vs prod max abs diff {d:.2e}",
                  flush=True)
        for mode in ("quad", "quad_fixed", "oct_fixed", "interp4"):
            out = time_fn(lambda m_=mode: moments_variant(*args, k, tb=8,
                                                          mode=m_),
                          f"{mode} tb=8")
            d = np.max(np.abs(np.asarray(base) - np.asarray(out)))
            print(f"  {mode} tb=8 vs prod max abs diff {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
