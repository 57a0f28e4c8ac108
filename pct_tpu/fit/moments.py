"""Curvature from neighborhood MOMENTS — the large-k fit path.

The reference's chain (ref pointCloudToolbox.py:635-668) needs, per
query, only ORDER-INVARIANT functionals of the neighborhood plus two
specific points (the nearest and the kth for the sign fix, ref
:286-297):

- the 3×3 covariance (ref :277)               — degree ≤ 2 moments
- the quadratic fit's 6×6 normal equations    — degree ≤ 4 moments of
  (ref :350-360, rotated frame)                 the ROTATED coords

and rotated moments are linear images of raw moments: with s = R·r,
Σ w·s^β = Σ_α c_{αβ}(R) · Σ w·r^α. So the k-selection that dominates
large-k kNN (O(k·M) min/argmin rounds per query) can be replaced by
O(M) weighted monomial accumulations — the kernel finds the exact kth
distance by bisection on float bits (count passes, not selection) and
accumulates 35 monomial sums; this module turns those sums into the
same frames → fit → curvature chain.

Divergences from the list-based path (documented):
- distance TIES at the kth boundary get fractional weight
  (k - count_lt)/count_eq instead of first-in-candidate-order
  membership — order-invariant by construction; real scans have no
  exact ties, lattice shapes differ at tie boundaries by O(1/k) in the
  fit input.
- the anisotropic preconditioning of fit_quadratic uses the tangent
  RMS extent instead of the max extent (max is not a moment);
  preconditioning changes rounding, not the LS optimum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pct_tpu.curvature.explicit import Curvatures, explicit_curvatures
from pct_tpu.fit.eigh3 import smallest_eigvec3
from pct_tpu.fit.quadratic import _RIDGE, cholesky_solve6

# Moment layout: all exponent triples (a, b, c) with a+b+c <= 4,
# graded-lexicographic; index 0 is (0,0,0) = Σw (the weighted count).
MOMENT_EXPS: tuple = tuple(
    (a, b, c)
    for d in range(5)
    for a in range(d, -1, -1)
    for b in range(d - a, -1, -1)
    for c in (d - a - b,)
)
NUM_MOMENTS = len(MOMENT_EXPS)          # 35
_IDX = {e: i for i, e in enumerate(MOMENT_EXPS)}


def moment_index(a: int, b: int, c: int) -> int:
    return _IDX[(a, b, c)]


def neighborhood_moments(centered: jax.Array, weights: jax.Array,
                         sigma: jax.Array) -> jax.Array:
    """Reference/XLA moment accumulator (the Pallas kernel's oracle).

    centered: (..., k, 3) neighborhoods r_i = p_i - q
    weights:  (..., k) per-neighbor weights (1 for members, fractional
              at kth-distance ties, 0 otherwise)
    sigma:    (...,) per-query scale (the kth distance); moments are of
              r̂ = r/σ so every entry is O(1) in float32.
    Returns (..., NUM_MOMENTS).
    """
    s = jnp.maximum(sigma, 1e-30)[..., None]
    # clamp: members satisfy |r|/σ <= 1 by construction; non-members
    # (w = 0) may be arbitrarily far — bound them so w·x̂^4 can't be 0·inf
    xh = jnp.clip(centered[..., 0] / s, -2.0, 2.0)
    yh = jnp.clip(centered[..., 1] / s, -2.0, 2.0)
    zh = jnp.clip(centered[..., 2] / s, -2.0, 2.0)
    out = []
    for (a, b, c) in MOMENT_EXPS:
        mono = weights
        for _ in range(a):
            mono = mono * xh
        for _ in range(b):
            mono = mono * yh
        for _ in range(c):
            mono = mono * zh
        out.append(jnp.sum(mono, axis=-1))
    return jnp.stack(out, axis=-1)


# ---- symbolic rotation of moments -----------------------------------------
# A "poly" is a dict {(a,b,c): coeff-array} over the raw coords r̂.


def _pmul(p, q):
    out = {}
    for ea, ca in p.items():
        for eb, cb in q.items():
            e = (ea[0] + eb[0], ea[1] + eb[1], ea[2] + eb[2])
            prod = ca * cb
            out[e] = out[e] + prod if e in out else prod
    return out


def _peval(p, m):
    """Σ coeff · moment — evaluate a poly against the moment vector."""
    acc = None
    for e, c in p.items():
        term = c * m[..., _IDX[e]]
        acc = term if acc is None else acc + term
    return acc


def _moment_tensors(m: jax.Array):
    """Moment vector -> dense symmetric moment tensors M1 (...,3),
    M2 (...,3,3), M3 (...,3,3,3), M4 (...,3,3,3,3): tensor entry
    (i1..id) is the moment with exponent = the index multiset."""
    def mom(*axes):
        e = [0, 0, 0]
        for a in axes:
            e[a] += 1
        return m[..., _IDX[tuple(e)]]

    M1 = jnp.stack([mom(i) for i in range(3)], axis=-1)
    M2 = jnp.stack([jnp.stack([mom(i, j) for j in range(3)], -1)
                    for i in range(3)], -2)
    M3 = jnp.stack([jnp.stack([jnp.stack([mom(i, j, kk) for kk in range(3)],
                                         -1)
                               for j in range(3)], -2)
                    for i in range(3)], -3)
    M4 = jnp.stack(
        [jnp.stack([jnp.stack([jnp.stack([mom(i, j, kk, ll)
                                          for ll in range(3)], -1)
                               for kk in range(3)], -2)
                    for j in range(3)], -3)
         for i in range(3)], -4)
    return M1, M2, M3, M4


def rotated_moments(m: jax.Array, R: jax.Array) -> dict:
    """s-moments Σ w·(R r̂)^β needed by the quadratic fit.

    m: (..., NUM_MOMENTS) raw moments; R: (..., 3, 3) with s = R r̂.
    Returns {(a, b, c): (...)-array} for all (a,b,0) a+b<=4 and
    (a,b,1) a+b<=2 — the 21 moments the 6×6 normal equations need.

    Computed as degree-d tensor contractions S_d = R^{⊗d}·M_d (a handful
    of batched einsums over 3-wide axes) — the equivalent symbolic
    per-term expansion (``rotated_moments_symbolic``) emits ~5k HLO ops,
    which at million-point batch sizes drove the XLA compile beyond an
    hour. Small-axis einsums are pinned to HIGHEST precision (TPU f32
    matmuls default to bf16 passes)."""
    hi = jax.lax.Precision.HIGHEST
    M1, M2, M3, M4 = _moment_tensors(m)
    # contract ONE R factor at a time: a joint einsum lets XLA build the
    # R⊗R⊗R⊗R outer product (6561·n floats — 27 GB at 1M points); the
    # stepwise form's largest intermediate is the 81·n tensor itself
    S1 = jnp.einsum("...ai,...i->...a", R, M1, precision=hi)
    t2 = jnp.einsum("...bj,...ij->...ib", R, M2, precision=hi)
    S2 = jnp.einsum("...ai,...ib->...ab", R, t2, precision=hi)
    t3 = jnp.einsum("...ck,...ijk->...ijc", R, M3, precision=hi)
    t3 = jnp.einsum("...bj,...ijc->...ibc", R, t3, precision=hi)
    S3 = jnp.einsum("...ai,...ibc->...abc", R, t3, precision=hi)
    t4 = jnp.einsum("...dl,...ijkl->...ijkd", R, M4, precision=hi)
    t4 = jnp.einsum("...ck,...ijkd->...ijcd", R, t4, precision=hi)
    t4 = jnp.einsum("...bj,...ijcd->...ibcd", R, t4, precision=hi)
    S4 = jnp.einsum("...ai,...ibcd->...abcd", R, t4, precision=hi)
    S = {(0, 0, 0): m[..., _IDX[(0, 0, 0)]]}

    def pick(t, axes):
        idx = tuple(axes)
        return t[(Ellipsis,) + idx]

    for (a, b, c) in [(1, 0, 0), (0, 1, 0), (0, 0, 1)]:
        S[(a, b, c)] = pick(S1, [0] * a + [1] * b + [2] * c)
    for d, t in ((2, S2), (3, S3), (4, S4)):
        for a in range(d + 1):
            for b in range(d - a + 1):
                c = d - a - b
                if c > 1 or (c == 1 and a + b > 2):
                    continue  # the fit never reads these
                S[(a, b, c)] = pick(t, [0] * a + [1] * b + [2] * c)
    return S


def rotated_moments_symbolic(m: jax.Array, R: jax.Array) -> dict:
    """Per-term symbolic expansion (test oracle for rotated_moments)."""
    sx = {(1, 0, 0): R[..., 0, 0], (0, 1, 0): R[..., 0, 1],
          (0, 0, 1): R[..., 0, 2]}
    sy = {(1, 0, 0): R[..., 1, 0], (0, 1, 0): R[..., 1, 1],
          (0, 0, 1): R[..., 1, 2]}
    sz = {(1, 0, 0): R[..., 2, 0], (0, 1, 0): R[..., 2, 1],
          (0, 0, 1): R[..., 2, 2]}
    one = {(0, 0, 0): jnp.ones_like(R[..., 0, 0])}
    # powers sx^a · sy^b by dynamic programming
    pows = {(0, 0): one}
    for a in range(1, 5):
        pows[(a, 0)] = _pmul(pows[(a - 1, 0)], sx)
    for a in range(0, 5):
        for b in range(1, 5 - a):
            pows[(a, b)] = _pmul(pows[(a, b - 1)], sy)
    S = {}
    for (a, b), p in pows.items():
        S[(a, b, 0)] = _peval(p, m)
        if a + b <= 2:
            S[(a, b, 1)] = _peval(_pmul(p, sz), m)
    return S


# ---- the full chain ---------------------------------------------------------

_PHI = ((2, 0), (0, 2), (1, 1), (1, 0), (0, 1), (0, 0))  # [a²,b²,ab,a,b,1]


def fit_quadratic_from_moments(S: dict, cnt: jax.Array,
                               sigma: jax.Array) -> jax.Array:
    """6 Monge coefficients (true, unscaled units) from s-moments of the
    σ-scaled rotated neighborhood. Mirrors fit_quadratic's normal
    equations + relative ridge + unrolled Cholesky, with RMS anisotropic
    preconditioning (see module docstring)."""
    cnt = jnp.maximum(cnt, 1.0)
    sa = jnp.sqrt(jnp.maximum(S[(2, 0, 0)] / cnt, 1e-20))
    sb = jnp.sqrt(jnp.maximum(S[(0, 2, 0)] / cnt, 1e-20))
    inv_a, inv_b = 1.0 / sa, 1.0 / sb

    def scaled(a, b, c):
        return S[(a, b, c)] * inv_a**a * inv_b**b

    Gq = [[None] * 6 for _ in range(6)]
    rhs = [None] * 6
    for i, (ai, bi) in enumerate(_PHI):
        for j, (aj, bj) in enumerate(_PHI[i:], start=i):
            Gq[i][j] = Gq[j][i] = scaled(ai + aj, bi + bj, 0)
        rhs[i] = scaled(ai, bi, 1)
    G = jnp.stack([jnp.stack(Gq[i], axis=-1) for i in range(6)], axis=-2)
    rhs = jnp.stack(rhs, axis=-1)
    trace = jnp.trace(G, axis1=-2, axis2=-1)
    G = G + (_RIDGE * trace[..., None, None] / 6.0) * jnp.eye(6, dtype=G.dtype)
    c = cholesky_solve6(G, rhs)
    # undo the anisotropic scale, then the σ scale (s = σ·ŝ):
    # A = Â/(sa²σ), B = B̂/(sb²σ), C = Ĉ/(sa·sb·σ), D = D̂/sa, E = Ê/sb,
    # F = F̂·σ
    s = jnp.maximum(sigma, 1e-30)
    scale_back = jnp.stack([
        inv_a * inv_a / s, inv_b * inv_b / s, inv_a * inv_b / s,
        inv_a, inv_b, s,
    ], axis=-1)
    return c * scale_back


def covariance_from_moments(m: jax.Array) -> jax.Array:
    """(..., 3, 3) neighborhood covariance (mean-centered, /(cnt-1)) from
    degree ≤ 2 raw moments — matches neighborhood_covariance (the σ²
    scale is dropped: eigenvectors are scale-invariant)."""
    cnt = jnp.maximum(m[..., _IDX[(0, 0, 0)]], 1.0)
    mu = jnp.stack([m[..., _IDX[(1, 0, 0)]], m[..., _IDX[(0, 1, 0)]],
                    m[..., _IDX[(0, 0, 1)]]], axis=-1) / cnt[..., None]
    f = 1.0 / jnp.maximum(cnt - 1.0, 1.0)

    def cov(e, i, j):
        return (m[..., _IDX[e]] - cnt * mu[..., i] * mu[..., j]) * f

    sxx = cov((2, 0, 0), 0, 0)
    syy = cov((0, 2, 0), 1, 1)
    szz = cov((0, 0, 2), 2, 2)
    sxy = cov((1, 1, 0), 0, 1)
    sxz = cov((1, 0, 1), 0, 2)
    syz = cov((0, 1, 1), 1, 2)
    return jnp.stack([
        jnp.stack([sxx, sxy, sxz], -1),
        jnp.stack([sxy, syy, syz], -1),
        jnp.stack([sxz, syz, szz], -1),
    ], axis=-2)


def curvature_from_moments_chunked(m: jax.Array, sigma: jax.Array,
                                   nearest: jax.Array, kth_pt: jax.Array,
                                   chunk: int = 16384,
                                   rotation: str = "symbolic"):
    """``curvature_from_moments`` in N-chunks via ``lax.map``.

    The contraction rotation's intermediates carry trailing (3,...,3)
    dims that XLA's TPU layout tiles to (4,128) — a 57× inflation that
    materialized the (N,3,3,3,3) M4 tensor at 19.3 GB for N=1M and
    OOM'd the 16 GB HBM (round-2 bench failure). Chunking bounds every
    such buffer to ~chunk·9·512·4 B ≈ 300 MB at the default chunk while
    tracing the body once; results match the unchunked call up to
    fusion-order FP rounding (pad rows are dropped).

    ``rotation="symbolic"`` (default) rotates via the per-term scalar
    expansion instead: every array stays (chunk,)-shaped and lane-major
    — no (·,3,…,3) intermediates at all — 833 -> 47 ms for the 1M
    epilogue on v5e (scripts/micro_epilogue.py; outputs agree to 1e-7
    scale-rel, and it even COMPILES faster, 4.6 s vs 7.8 s). The
    ~5k-op body is traced ONCE here (instantiating it inside every
    per-bucket lax.map body is what made the round-2 compile
    pathological, not the op count itself)."""
    n = m.shape[0]
    if n <= chunk:
        return curvature_from_moments(m, sigma, nearest, kth_pt, rotation)
    pad = (-n) % chunk

    def part(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)).reshape(
            (-1, chunk) + a.shape[1:])

    curv, nrm = jax.lax.map(
        lambda args: curvature_from_moments(*args, rotation=rotation),
        (part(m), part(sigma), part(nearest), part(kth_pt)))

    def unpart(a):
        return a.reshape((-1,) + a.shape[2:])[:n]

    return jax.tree_util.tree_map(unpart, curv), unpart(nrm)


def curvature_from_moments(m: jax.Array, sigma: jax.Array,
                           nearest: jax.Array, kth_pt: jax.Array,
                           rotation: str = "symbolic"):
    """Moments → (Curvatures, normals): the same chain as
    tangent_frames + fit_quadratic + explicit_curvatures.

    nearest/kth_pt: (..., 3) the first and kth neighbor offsets p - q
    (unscaled), for the reference's sign fix pts[-1] - pts[0]
    (ref pointCloudToolbox.py:286-297).
    """
    from pct_tpu.fit.frames import rodrigues_to_z

    cov = covariance_from_moments(m)
    _, n = smallest_eigvec3(cov)
    ref_vec = kth_pt - nearest
    flip = jnp.sum(n * ref_vec, axis=-1) < 0.0
    n = jnp.where(flip[..., None], -n, n)
    R = rodrigues_to_z(n)
    if rotation == "symbolic":
        S = rotated_moments_symbolic(m, R)
    else:
        S = rotated_moments(m, R)
    cnt = m[..., _IDX[(0, 0, 0)]]
    coeffs = fit_quadratic_from_moments(S, cnt, sigma)
    return explicit_curvatures(coeffs), n
