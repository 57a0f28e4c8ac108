"""Pallas TPU kernel: large-k neighborhoods as MOMENT accumulation.

The top-k select kernel (pallas_select.py) costs O(k·M) min/argmin
rounds per query — right for k≈20, hopeless at k≈100 where M grows to
thousands (the scans workload, ref utils.py:484 k_neighbors=100). This
kernel replaces selection with order-invariant reductions:

1. d² for all M candidates (kept in VMEM as int32 BITS — non-negative
   float32 compares are monotone on their bit patterns);
2. the EXACT kth distance by bisection on those bits: 32 rounds of
   (count ≤ mid) — O(32·M) cheap compare+sum passes instead of
   O(k·M) argmin rounds;
3. weights w = 1 below the kth distance, (k-count_lt)/count_eq AT it
   (fractional tie split, see fit/moments.py docstring), 0 above;
4. 35 weighted monomial sums of r̂ = (p-q)/σ up to degree 4 (σ = kth
   distance, so every monomial is O(1) in f32), plus the nearest and
   kth neighbor offsets for the reference's normal sign fix.

Layout: the candidate axis is reshaped OUTSIDE the kernel to
(G, 1, chunk) with G a leading UNTILED ref dimension, so every pass is
a `fori_loop` over G with dynamic leading-axis indexing — Mosaic
compiles the loop body once (an unrolled-chunks version compiled for
tens of minutes at 1M-scale statics and accumulated ~60 MB of
scoped-VMEM stack; value lane-slices are also unsupported, so chunked
passes must slice refs, never loaded values).

fit/moments.py turns the output into the frames → fit → curvature
chain. Output layout per query row (NOUT=48):
  [0:35]  moments (graded-lex, fit.moments.MOMENT_EXPS order)
  [35]    tau   — kth squared distance (f32)
  [36]    count_lt, [37] count_le
  [38]    sigma — sqrt(tau)
  [39:42] nearest neighbor offset r₁ = p₁ - q
  [42:45] kth neighbor offset r_k = p_k - q
  [45]    found (1.0 iff count_le >= k)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pct_tpu.fit.moments import MOMENT_EXPS

_SENT = 3.0e38          # invalid-slot sentinel (python scalar, see
                        # pallas_select.py: jnp constants can't be captured)
# its float32 bit pattern, as a python int (computed at import: scalar
# extraction of a traced bitcast would lower as an unsupported gather)
_SENT_BITS = int(_np.float32(_SENT).view(_np.int32))
NOUT = 48


def _moment_kernel(qx_ref, qy_ref, qz_ref, px_ref, py_ref, pz_ref,
                   cand_ref, qrow_ref, len_ref, out_ref, d2i_ref,
                   *, k: int):
    qx, qy, qz = qx_ref[:, 0], qy_ref[:, 0], qz_ref[:, 0]    # (tb, C)
    qrow = qrow_ref[:, 0]
    tb, c = qx.shape
    g_chunks = px_ref.shape[1]
    chunk = px_ref.shape[3]

    # ---- 1. d² bits into the (G, tb, C, chunk) scratch ----
    # min/max ride along: mn seeds the nearest-argmin pass (the old
    # standalone min pass is gone) and [mn, mx] brackets the bisection —
    # real candidate spreads span ~2^26 of the 2^31 bit range, so the
    # while-loop below converges in ~26 rounds instead of a fixed 32
    # (pad-only tiles exit immediately).
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

    def count_le_fn(thresh):                                 # (tb, C) int32
        def body(g, cnt):
            return cnt + jnp.sum(
                (d2i_ref[g] <= thresh[:, :, None]).astype(jnp.int32),
                axis=-1)

        return jax.lax.fori_loop(0, g_chunks, body,
                                 jnp.zeros((tb, c), jnp.int32))

    # ---- 2. exact kth bits by bisection (count rounds, seeded) ----
    # invariants: count_le(lo) < k <= count_le(hi) when k is reachable.
    # lo0 = mn-1 counts 0; hi0 = mx counts every valid candidate, so
    # under-k rows converge to the max valid d² (what the XLA oracle
    # re-derives) and empty rows to 0 (lo0 clamps to hi0 there). The
    # fixed-32-round fori_loop is replaced by a while_loop on the max
    # remaining bracket width: exact same fixpoint, data-adaptive
    # round count.
    def bisect_cond(carry):
        lo, hi = carry
        return jnp.max(hi - lo) > 1

    def bisect(carry):
        lo, hi = carry                                       # (1, C) int32
        mid = lo + (hi - lo) // 2
        ge = count_le_fn(mid) >= k
        return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

    hi0 = jnp.maximum(mx, 0)
    lo0 = jnp.minimum(mn - 1, hi0)
    _, tau_bits = jax.lax.while_loop(bisect_cond, bisect, (lo0, hi0))

    tau_b = tau_bits[:, :, None]
    count_le = count_le_fn(tau_bits)
    count_lt = count_le_fn(tau_bits - 1)   # bits-1: strictly-below count
    found = count_le >= k

    # ---- nearest + kth neighbor positions (iota first-match) ----

    def am_body(g, carry):
        am_n, am_k = carry
        d2c = d2i_ref[g]                                     # (tb, C, chunk)
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

    # ---- weights + 35 weighted monomial sums ----
    tau = pltpu.bitcast(tau_bits, jnp.float32)
    sigma = jnp.sqrt(jnp.maximum(tau, 0.0))
    inv_sig = 1.0 / jnp.maximum(sigma, 1e-30)
    count_eq = jnp.maximum(count_le - count_lt, 1)
    w_tie = jnp.clip((k - count_lt).astype(jnp.float32)
                     / count_eq.astype(jnp.float32), 0.0, 1.0)

    nm = len(MOMENT_EXPS)

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
        # members satisfy |r|/σ <= 1; clamp the w=0 rest so w·x̂ᵃ≠0·inf
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

    zero = jnp.zeros((tb, c), jnp.float32)
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


@partial(jax.jit, static_argnames=("k", "block_cells", "chunk", "interpret"))
def knn_moments(qpts: jax.Array, cpts: jax.Array, cand: jax.Array,
                qrow: jax.Array, valid: jax.Array, k: int,
                block_cells: int = 0, chunk: int = 1024,
                interpret: bool = False):
    """(T,C,3) queries vs (T,M,3) candidates -> (T,C,NOUT) moment stats.

    Same input contract as ops.pallas_select.knn_select; see the module
    docstring for the output layout. The candidate axis is padded to a
    multiple of ``chunk`` (pad slots invalid).

    ``block_cells`` batches that many cell tiles per Pallas program
    (0 = auto). Outputs are bit-identical to tb=1 — the bisection
    while-loop's condition spans the batch, but converged rows are
    fixpoints — and the batch amortizes per-program overhead and the
    straggler rounds of the data-adaptive bisection (measured at the 1M
    k=100 bucket shapes: 106→72, 86→66, 71→62 ms; tb=16 is flat vs 8;
    scripts/micro_moments_split.py). Auto keeps the batched
    (tb,C,chunk) tiles under ~2 MB so the ~25 live monomial buffers of
    the moment pass stay inside the 100 MB VMEM budget.
    """
    from pct_tpu.ops.pallas_select import _axes3

    t, c, _ = qpts.shape
    # pad the query axis to a sublane multiple: Mosaic compiles odd C
    # catastrophically slowly (measured: C=266 113 s vs C=272 ~2 s)
    pad_c = (-c) % 8
    if pad_c:
        qpts = jnp.pad(qpts, ((0, 0), (0, pad_c), (0, 0)))
        qrow = jnp.pad(qrow, ((0, 0), (0, pad_c)), constant_values=-1)
    cp = c + pad_c
    px, py, pz = _axes3(cpts)
    m = px.shape[1]
    # minimal-padding chunking: the fewest `chunk`-bounded pieces, each
    # the smallest 256-multiple that covers m/g (the packed-run M axis
    # is no longer a power-of-two-ish multiple of 1024; naive rounding
    # to the requested chunk padded M up to ~60%).
    # 256-multiples, NOT 128: chunk=896 (7 x 128 lanes) at C=128 is a
    # DEVICE-KILLING Mosaic static — the k=50 moment kernel at
    # (C=128, m=1560 -> chunk 896) deterministically faulted the TPU
    # ("UNAVAILABLE: kernel fault" twice in sweep_r5_200k_perturbed,
    # INTERNAL backend error in scripts/bisect_moment_fault.py), while
    # the identical geometry at chunk 768/1024 runs everywhere (the
    # cylinder/torus siblings, m=1432/2040/2200). Rounding to 256 maps
    # the hostile class onto the proven chunk=1024 program at <= 14%
    # extra pad.
    g_min = -(-m // chunk)
    per_piece = -(-m // g_min)
    chunk = -(-per_piece // 256) * 256
    pad_m = (-m) % chunk
    if pad_m:
        px, py, pz = (jnp.pad(a, ((0, 0), (0, pad_m)))
                      for a in (px, py, pz))
        cand = jnp.pad(cand, ((0, 0), (0, pad_m)), constant_values=-2)
        valid = jnp.pad(valid, ((0, 0), (0, pad_m)))
    mp = m + pad_m
    g = mp // chunk

    tb = block_cells
    if tb <= 0:
        tb = max(1, min(8, (2 * 1024 * 1024) // (cp * chunk * 4)))
    # pad the tile axis; pad tiles carry valid=0 + qrow=-1, so every row
    # is all-invalid and the bisection bracket starts converged
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
        partial(_moment_kernel, k=k),
        grid=grid,
        in_specs=[cspec, cspec, cspec, gspec, gspec, gspec, gspec, cspec,
                  gspec],
        out_specs=pl.BlockSpec((tb, cp, NOUT), b3, memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((tp, cp, NOUT), jnp.float32),
        scratch_shapes=[pltpu.VMEM((g, tb, cp, chunk), jnp.int32)],
        # the d² scratch plus one loop iteration's temporaries exceed
        # Mosaic's default 16 MB scoped-VMEM budget at production sizes;
        # v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qpts[:, None, :, 0], qpts[:, None, :, 1], qpts[:, None, :, 2],
      as_g(px), as_g(py), as_g(pz),
      as_g(cand), qrow[:, None, :], as_g(valid))
    return out[:t, :c]


def xla_moment_stats(qpts, cpts, cand, qrow, valid, k: int):
    """knn_moments_xla packed into the kernel's (T, C, NOUT) layout."""
    d = knn_moments_xla(qpts, cpts, cand, qrow, valid, k)
    t, c = d["sigma"].shape
    z = jnp.zeros((t, c), jnp.float32)
    cols = ([d["moments"][..., i] for i in range(len(MOMENT_EXPS))]
            + [d["tau"], d["count_lt"].astype(jnp.float32),
               d["count_le"].astype(jnp.float32), d["sigma"]]
            + [d["nearest"][..., j] for j in range(3)]
            + [d["kth"][..., j] for j in range(3)]
            + [d["found"].astype(jnp.float32), z, z])
    return jnp.stack(cols, axis=-1)


def knn_moments_xla(qpts, cpts, cand, qrow, valid, k: int):
    """XLA reference of the kernel's semantics (exact kth via top_k; the
    d² math is the same world-coordinate difference form, so outputs
    match the kernel bit-for-bit up to compiler fusion)."""
    from pct_tpu.ops.pallas_select import _axes3

    t, c, _ = qpts.shape
    px, py, pz = _axes3(cpts)
    m = px.shape[1]
    dx = qpts[:, :, None, 0] - px[:, None, :]
    dy = qpts[:, :, None, 1] - py[:, None, :]
    dz = qpts[:, :, None, 2] - pz[:, None, :]
    d2 = dx * dx + dy * dy + dz * dz
    ok = (valid[:, None, :] > 0) & (cand[:, None, :] != qrow[:, :, None])
    d2 = jnp.where(ok, d2, _SENT)
    neg, _ = jax.lax.top_k(-d2, k)
    tau = -neg[..., -1]
    # kernel bisection ends at the largest VALID d² when fewer than k
    # valid candidates exist (and 0 when none): gate on the valid count,
    # never on a count taken at tau=_SENT (d2 <= _SENT also counts the
    # sentinel slots, which made found spuriously true on under-k rows)
    n_valid = jnp.sum(ok.astype(jnp.int32), axis=-1)
    any_valid = n_valid > 0
    tau = jnp.where(n_valid >= k, tau,
                    jnp.where(any_valid,
                              jnp.max(jnp.where(ok, d2, -jnp.inf),
                                      axis=-1), 0.0))
    count_lt = jnp.sum((d2 < tau[..., None]).astype(jnp.int32), -1)
    count_le = jnp.sum((d2 <= tau[..., None]).astype(jnp.int32), -1)
    found = count_le >= k
    sigma = jnp.sqrt(jnp.maximum(tau, 0.0))
    count_eq = jnp.maximum(count_le - count_lt, 1)
    w_tie = jnp.clip((k - count_lt) / count_eq, 0.0, 1.0)
    w = (jnp.where(d2 < tau[..., None], 1.0, 0.0)
         + jnp.where(d2 == tau[..., None], 1.0, 0.0) * w_tie[..., None])
    r = -jnp.stack([dx, dy, dz], axis=-1)  # candidate - query, per axis
    iota = jnp.arange(m)
    am_n = jnp.argmin(d2, axis=-1)
    near = jnp.take_along_axis(r, am_n[..., None, None].repeat(3, -1),
                               axis=2)[:, :, 0, :]
    eq_k = d2 == tau[..., None]
    am_k = jnp.min(jnp.where(eq_k, iota, m), axis=-1)
    am_kc = jnp.minimum(am_k, m - 1)
    kth = jnp.take_along_axis(r, am_kc[..., None, None].repeat(3, -1),
                              axis=2)[:, :, 0, :]
    kth = jnp.where((found & (am_k < m))[..., None], kth, 0.0)
    from pct_tpu.fit.moments import neighborhood_moments

    moments = neighborhood_moments(r, w, sigma)
    return dict(moments=moments, tau=tau, count_lt=count_lt,
                count_le=count_le, sigma=sigma, nearest=near, kth=kth,
                found=found)
