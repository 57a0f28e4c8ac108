"""Batched explicit-quadratic (Monge patch) least-squares fit.

z = A a² + B b² + C ab + D a + E b + F over the rotated neighborhood
(ref pointCloudToolbox.py:332-360 ``fit_quadratic_surface``: design
matrix [a², b², ab, a, b, 1] + np.linalg.lstsq). TPU redesign: the
per-point lstsq becomes a batched 6×6 normal-equations solve — the
(k×6)ᵀ(k×6) Gram products are batched matmuls on the MXU, the 6×6
solves are one batched XLA op. For float32 robustness the neighborhood
is pre-scaled to unit radius (condition number of the Gram matrix drops
from O(1/h⁴) to O(1)), and the coefficients are unscaled afterwards:
with x = h·x̃, A = Ã/h, …, F = F̃·h.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_RIDGE = 1e-7


def cholesky_solve(G: jax.Array, rhs: jax.Array) -> jax.Array:
    """Batched symmetric-positive-definite n×n solve, fully unrolled
    (n static from the trailing shape; used at 6 for the quadratic fit
    and 10 for the implicit-quadric inverse iteration).

    XLA's batched ``linalg.solve`` lowers to a pivoted LU whose inner
    control flow dominates the curvature pass on TPU (~1.7 s/1M points);
    an unrolled Cholesky is pure element-wise VPU math across the batch.
    G must be SPD (callers add a relative ridge to guarantee it).
    """
    n = G.shape[-1]
    L = [[None] * n for _ in range(n)]
    invd = [None] * n
    for j in range(n):
        s = G[..., j, j]
        for t in range(j):
            s = s - L[j][t] * L[j][t]
        # dead-column drop: exactly singular G (perfectly collinear
        # lattice neighborhoods) must behave like lstsq's min-norm
        # solution (component -> 0), not produce inf-inf = NaN
        dead = s < 1e-10 * jnp.abs(G[..., j, j]) + 1e-30
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
        invd[j] = jnp.where(dead, 0.0, 1.0 / L[j][j])
        for i in range(j + 1, n):
            s = G[..., i, j]
            for t in range(j):
                s = s - L[i][t] * L[j][t]
            L[i][j] = s * invd[j]
    # forward substitution L y = rhs
    y = [None] * n
    for i in range(n):
        s = rhs[..., i]
        for t in range(i):
            s = s - L[i][t] * y[t]
        y[i] = s * invd[i]
    # back substitution Lᵀ x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for t in range(i + 1, n):
            s = s - L[t][i] * x[t]
        x[i] = s * invd[i]
    return jnp.stack(x, axis=-1)


cholesky_solve6 = cholesky_solve   # back-compat alias


def quadratic_design(ab: jax.Array) -> jax.Array:
    """(..., k, 2) -> (..., k, 6) design matrix [a², b², ab, a, b, 1]."""
    a, b = ab[..., 0], ab[..., 1]
    return jnp.stack([a * a, b * b, a * b, a, b, jnp.ones_like(a)], axis=-1)


def fit_quadratic(rotated: jax.Array, mask: jax.Array | None = None):
    """(..., k, 3) rotated neighborhoods -> (..., 6) coefficients.

    Solves min ||W^(1/2)(Xc - z)||² via scaled normal equations with a
    tiny relative ridge (stand-in for lstsq's pseudo-inverse behavior on
    rank-deficient neighborhoods — lstsq returns the min-norm solution,
    the ridge returns a nearby bounded solution; divergence documented).
    """
    if mask is None:
        mask = jnp.ones(rotated.shape[:-1], dtype=bool)
    m = mask.astype(rotated.dtype)
    # ANISOTROPIC per-axis scaling: lattice-sampled scans have strongly
    # elliptical neighborhoods (e.g. 3:1 on the torus generator); a single
    # radius scale leaves the a/b columns unbalanced and the Gram
    # condition number squares that imbalance. Normalize each tangent
    # axis to unit extent, leave z unscaled (LS is rhs-scale-equivariant).
    sa = jnp.sqrt(jnp.maximum(
        jnp.max(rotated[..., 0] ** 2 * mask, axis=-1), 1e-20))[..., None]
    sb = jnp.sqrt(jnp.maximum(
        jnp.max(rotated[..., 1] ** 2 * mask, axis=-1), 1e-20))[..., None]
    a = rotated[..., 0] / sa
    b = rotated[..., 1] / sb
    # Gram/rhs as 21+6 elementwise k-axis reductions instead of
    # (...,k,6)ᵀ(...,k,6) einsums: the tiny batched matmul pads onto MXU
    # tiles at ~5x the VPU cost (measured on v5e), and VPU f32 products
    # are exact f32 so no Precision pin is needed.
    cols = [a * a * m, b * b * m, a * b * m, a * m, b * m, m]
    zm = rotated[..., 2] * m
    Gq = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i, 6):
            Gq[i][j] = Gq[j][i] = jnp.sum(cols[i] * cols[j], axis=-1)
    rhs = jnp.stack([jnp.sum(cols[i] * zm, axis=-1) for i in range(6)],
                    axis=-1)
    G = jnp.stack([jnp.stack(Gq[i], axis=-1) for i in range(6)], axis=-2)
    trace = jnp.trace(G, axis1=-2, axis2=-1)
    G = G + (_RIDGE * trace[..., None, None] / 6.0) * jnp.eye(6, dtype=G.dtype)
    c = cholesky_solve(G, rhs)
    # unscale: z = Ã(a/sa)² + ... ⇒ A = Ã/sa², B = B̃/sb², C = C̃/(sa·sb),
    # D = D̃/sa, E = Ẽ/sb, F = F̃
    scale_back = jnp.concatenate([
        1.0 / (sa * sa), 1.0 / (sb * sb), 1.0 / (sa * sb),
        1.0 / sa, 1.0 / sb, jnp.ones_like(sa),
    ], axis=-1)
    return c * scale_back


def fit_quadratic_lstsq_oracle(rotated, mask=None):
    """Reference-semantics oracle (vmapped jnp lstsq, SVD-based). Slow;
    used by tests to bound the normal-equations divergence."""
    if mask is None:
        mask = jnp.ones(rotated.shape[:-1], dtype=bool)
    m = mask[..., None].astype(rotated.dtype)
    X = quadratic_design(rotated[..., :2]) * m
    z = rotated[..., 2] * mask

    def one(Xi, zi):
        return jnp.linalg.lstsq(Xi, zi)[0]

    flatX = X.reshape((-1,) + X.shape[-2:])
    flatz = z.reshape((-1, z.shape[-1]))
    c = jax.vmap(one)(flatX, flatz)
    return c.reshape(X.shape[:-2] + (6,))
