"""Batched tangent-frame estimation: covariance → normal → sign fix →
Rodrigues rotation into the tangent plane.

Faithful TPU-native re-derivation of the reference's per-point
``get_best_fit_plane_and_rotate`` (ref pointCloudToolbox.py:270-319):

- covariance of the (already centered) neighborhood (ref :277)
- normal = singular vector of the smallest singular value (ref :280-283);
  here the smallest eigenvector of the 3×3 covariance via the closed-form
  solver (same subspace, no LAPACK)
- sign fix: flip the normal if its dot with the reference vector
  ``pts[-1] - pts[0]`` is negative (ref :286-297). The neighbor rows are
  distance-sorted, so pts[-1] is the farthest neighbor and pts[0] the
  nearest, exactly as the cKDTree query ordering gives the reference.
- Rodrigues rotation R aligning the normal with +z:
  R = I + K + K²(1-c)/s², with the reference's identity fallback when
  s < 1e-8 (ref :299-312). NOTE (preserved quirk): the fallback also
  fires when the normal is exactly -z (s=0, c=-1), leaving the patch
  upside down — the reference does the same.

All functions are batched over a leading axis; masks make padded
neighbor slots inert.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pct_tpu.fit.eigh3 import smallest_eigvec3


def neighborhood_covariance(centered: jax.Array, mask: jax.Array | None = None
                            ) -> jax.Array:
    """(..., k, 3) centered neighborhoods -> (..., 3, 3) covariance.

    Matches np.cov(points.T) semantics of ref :277 — mean-subtracted
    within the neighborhood (the reference centers at the query point
    first, then np.cov subtracts the neighborhood mean again), divided
    by (count - 1).
    """
    if mask is None:
        mask = jnp.ones(centered.shape[:-1], dtype=bool)
    m = mask.astype(centered.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    # elementwise per-component sums instead of a (...,k,3)x(...,k,3)
    # einsum: XLA lowers the tiny batched matmul onto padded MXU tiles at
    # ~5x the cost of these VPU reductions (measured on v5e), and VPU f32
    # multiplies are exact f32 (no bf16 passes), so no precision pin is
    # needed.
    x, y, z = centered[..., 0] * m, centered[..., 1] * m, centered[..., 2] * m
    inv = 1.0 / cnt
    mx, my, mz = (jnp.sum(x, -1) * inv, jnp.sum(y, -1) * inv,
                  jnp.sum(z, -1) * inv)
    x = (x - mx[..., None]) * m
    y = (y - my[..., None]) * m
    z = (z - mz[..., None]) * m
    f = 1.0 / jnp.maximum(cnt - 1.0, 1.0)
    sxx, syy, szz = (jnp.sum(x * x, -1) * f, jnp.sum(y * y, -1) * f,
                     jnp.sum(z * z, -1) * f)
    sxy, sxz, syz = (jnp.sum(x * y, -1) * f, jnp.sum(x * z, -1) * f,
                     jnp.sum(y * z, -1) * f)
    return jnp.stack([
        jnp.stack([sxx, sxy, sxz], -1),
        jnp.stack([sxy, syy, syz], -1),
        jnp.stack([sxz, syz, szz], -1),
    ], axis=-2)


def estimate_normals(centered: jax.Array, mask: jax.Array | None = None):
    """(..., k, 3) -> (normal (...,3) sign-fixed, λ_min (...,)).

    Sign fix vs reference vector pts[last] - pts[first] (ref :286-297);
    with a mask, "last" is the farthest VALID neighbor (slots are
    distance-sorted), matching the reference's semantics on the actual
    neighborhood rather than reading a masked-out slot.
    """
    cov = neighborhood_covariance(centered, mask)
    lam, n = smallest_eigvec3(cov)
    if mask is None:
        ref_vec = centered[..., -1, :] - centered[..., 0, :]
    else:
        kk = centered.shape[-2]
        slots = jnp.arange(kk, dtype=jnp.int32)
        last = jnp.max(jnp.where(mask, slots, -1), axis=-1)
        last = jnp.maximum(last, 0)[..., None, None]
        farthest = jnp.take_along_axis(
            centered, jnp.broadcast_to(last, centered.shape[:-2] + (1, 3)),
            axis=-2)[..., 0, :]
        ref_vec = farthest - centered[..., 0, :]
    flip = jnp.sum(n * ref_vec, axis=-1) < 0.0
    n = jnp.where(flip[..., None], -n, n)
    return n, lam


def rodrigues_to_z(normal: jax.Array) -> jax.Array:
    """(...,3) unit normals -> (...,3,3) rotation R with R @ n = +z.

    R = I + K + K² (1-c)/s², K = skew(n × z); identity when s < 1e-8
    (ref pointCloudToolbox.py:299-312 incl. the s≈0 fallback quirk).
    """
    z = jnp.array([0.0, 0.0, 1.0], normal.dtype)
    v = jnp.cross(normal, jnp.broadcast_to(z, normal.shape))
    s2 = jnp.sum(v * v, axis=-1)
    s = jnp.sqrt(jnp.maximum(s2, 0.0))
    c = normal[..., 2]
    zeros = jnp.zeros_like(c)
    K = jnp.stack([
        jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
    ], axis=-2)
    eye = jnp.eye(3, dtype=normal.dtype)
    factor = (1.0 - c) / jnp.maximum(s2, 1e-20)
    K2 = jnp.einsum("...ij,...jk->...ik", K, K,
                    preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    R = eye + K + K2 * factor[..., None, None]
    return jnp.where((s < 1e-8)[..., None, None], eye, R)


def tangent_frames(centered: jax.Array, mask: jax.Array | None = None):
    """Full frame pass: (rotated (...,k,3), R (...,3,3), normal (...,3)).

    ``rotated`` are the neighborhoods expressed with the best-fit plane as
    the xy-plane (ref :315: rotated = (R @ pts.T).T == pts @ R.T).
    """
    normal, _ = estimate_normals(centered, mask)
    R = rodrigues_to_z(normal)
    # apply R elementwise instead of an einsum over (...,3,3)x(...,k,3):
    # R p = p + v×p + fac·v×(v×p) with v = n×z = (n_y, -n_x, 0),
    # fac = (1-n_z)/s², identity when s < 1e-8 (same formula/fallback as
    # rodrigues_to_z; VPU elementwise is ~5x cheaper than the padded-MXU
    # batched matmul and exact f32)
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    vx, vy = ny, -nx
    s2 = vx * vx + vy * vy
    fac = ((1.0 - nz) / jnp.maximum(s2, 1e-20))[..., None]
    small = (jnp.sqrt(s2) < 1e-8)[..., None]
    px, py, pz = centered[..., 0], centered[..., 1], centered[..., 2]
    vxe, vye = vx[..., None], vy[..., None]
    kp_x = vye * pz
    kp_y = -vxe * pz
    kp_z = vxe * py - vye * px
    k2p_x = vye * kp_z
    k2p_y = -vxe * kp_z
    k2p_z = vxe * kp_y - vye * kp_x
    a = jnp.where(small, px, px + kp_x + fac * k2p_x)
    b = jnp.where(small, py, py + kp_y + fac * k2p_y)
    c = jnp.where(small, pz, pz + kp_z + fac * k2p_z)
    rotated = jnp.stack([a, b, c], axis=-1)
    return rotated, R, normal
