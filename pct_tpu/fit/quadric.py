"""Batched implicit-quadric fit: F(x,y,z) = cᵀm(x,y,z), ||c|| = 1.

The reference minimizes ||Ac||² s.t. ||c||=1 with scipy SLSQP — an
iterative Fortran solve per point (ref pointCloudToolbox.py:363-396).
That constrained problem has a closed-form optimum: the eigenvector of
the smallest eigenvalue of the 10×10 Gram matrix AᵀA (equivalently the
smallest right singular vector of A). We batch the Gram build as VPU
reductions and recover that eigenvector by shifted inverse iteration on
an unrolled batched Cholesky (``smallest_eigvec_10`` — a full batched
eigh costs 17.0 s/1M on v5e for information we discard; ``solver="eigh"``
keeps the full decomposition as a test oracle). Same optimum as SLSQP
(SURVEY.md §2 native-replacement table).

Monomial order matches the reference design matrix (ref :365-376):
[x², y², z², xy, xz, yz, x, y, z, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pct_tpu.fit.quadratic import cholesky_solve


def smallest_eigvec_10(G: jax.Array, iters: int = 5,
                       shift: float = 1e-6) -> jax.Array:
    """Smallest eigenvector of a batched PSD 10×10 via shifted inverse
    iteration on the unrolled Cholesky.

    The batched ``jnp.linalg.eigh`` computes the FULL decomposition with
    QR-style inner control flow — measured 17.0 s/1M points on v5e when
    only the null direction is needed. Inverse iteration with a small
    relative shift converges at rate (λ₁+σ)/(λ₂+σ): on near-quadric
    data λ₁ ≈ 0 ≪ λ₂, so a handful of unrolled solve+normalize rounds
    (pure VPU math) recovers the same eigenvector. Near-degenerate
    λ₁ ≈ λ₂ neighborhoods return an arbitrary vector of the subspace —
    exactly as eigh's arbitrary basis choice does. The sign is
    canonicalized (largest-|component| positive; eigh's sign is
    arbitrary too).
    """
    n = G.shape[-1]
    tr = jnp.trace(G, axis1=-2, axis2=-1)[..., None, None]
    Gs = G + (shift / n) * tr * jnp.eye(n, dtype=G.dtype)
    x = jnp.full(G.shape[:-1], 1.0 / jnp.sqrt(jnp.float32(n)), G.dtype)
    for _ in range(iters):
        x = cholesky_solve(Gs, x)
        x = x / jnp.sqrt(jnp.maximum(
            jnp.sum(x * x, axis=-1, keepdims=True), 1e-30))
    pick = jnp.argmax(jnp.abs(x), axis=-1, keepdims=True)
    lead = jnp.take_along_axis(x, pick, axis=-1)
    return x * jnp.sign(jnp.where(lead == 0, 1.0, lead))


def quadric_design(pts: jax.Array) -> jax.Array:
    """(..., k, 3) -> (..., k, 10)."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    one = jnp.ones_like(x)
    return jnp.stack(
        [x * x, y * y, z * z, x * y, x * z, y * z, x, y, z, one], axis=-1
    )


def fit_quadric(centered: jax.Array, mask: jax.Array | None = None,
                scale_normalize: bool = True,
                solver: str = "inverse") -> jax.Array:
    """(..., k, 3) centered neighborhoods -> (..., 10) unit coefficients.

    ``scale_normalize`` pre-scales the neighborhood to unit radius before
    building the Gram matrix (f32 conditioning) and unscales the
    coefficients per monomial degree afterwards, then renormalizes. This
    changes the implicit column weighting relative to the reference's
    unscaled SLSQP problem; on near-quadric data both recover the same
    surface (tests gate the curvature outputs, which are what consumers
    use).
    """
    if mask is None:
        mask = jnp.ones(centered.shape[:-1], dtype=bool)
    m = mask[..., None].astype(centered.dtype)
    if scale_normalize:
        h2 = jnp.max(jnp.sum(centered**2, axis=-1) * mask, axis=-1)
        h = jnp.sqrt(jnp.maximum(h2, 1e-20))[..., None, None]
    else:
        h = jnp.ones(centered.shape[:-2] + (1, 1), centered.dtype)
    pts = centered / h
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    mm = mask.astype(centered.dtype)
    # 55 elementwise k-reductions instead of the (...,k,10)ᵀ(...,k,10)
    # einsum: the tiny batched matmul pads onto MXU tiles at ~5x the VPU
    # cost (measured on v5e; see fit/quadratic.py), and VPU f32 products
    # are exact f32 so no Precision pin is needed.
    cols = [x * x * mm, y * y * mm, z * z * mm, x * y * mm, x * z * mm,
            y * z * mm, x * mm, y * mm, z * mm, mm]
    Gq = [[None] * 10 for _ in range(10)]
    for i in range(10):
        for j in range(i, 10):
            Gq[i][j] = Gq[j][i] = jnp.sum(cols[i] * cols[j], axis=-1)
    G = jnp.stack([jnp.stack(Gq[i], axis=-1) for i in range(10)], axis=-2)
    if solver == "inverse":
        c = smallest_eigvec_10(G)
    else:  # "eigh": full decomposition oracle (tests bound the delta)
        w, V = jnp.linalg.eigh(G)
        c = V[..., :, 0]  # eigenvector of smallest eigenvalue
    hh = h[..., 0, 0][..., None]
    deg = jnp.array([2, 2, 2, 2, 2, 2, 1, 1, 1, 0], dtype=centered.dtype)
    c = c / hh**deg
    norm = jnp.sqrt(jnp.maximum(jnp.sum(c * c, axis=-1, keepdims=True), 1e-30))
    return c / norm
