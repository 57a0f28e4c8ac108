#!/usr/bin/env python
"""Micro-benchmark: einsum vs unrolled-elementwise implementations of the
per-point curvature chain (covariance, rotate, Gram/rhs) on real TPU."""

import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pct_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    Q, K = 1 << 20, 20
    key = jax.random.PRNGKey(0)
    centered = jax.random.normal(key, (Q, K, 3), jnp.float32) * 0.05

    from pct_tpu.fit.frames import tangent_frames
    from pct_tpu.fit.quadratic import fit_quadratic
    from pct_tpu.curvature.explicit import explicit_curvatures

    TILE = 16384

    def chain_current(c):
        def one(args):
            (cc,) = args
            rotated, _, normal = tangent_frames(cc)
            coeffs = fit_quadratic(rotated)
            return explicit_curvatures(coeffs), normal
        curv, nrm = jax.lax.map(one, (c.reshape(-1, TILE, K, 3),))
        return curv.K.reshape(-1).sum() + nrm.sum()

    # ---- elementwise variants ----
    from pct_tpu.fit.eigh3 import smallest_eigvec3

    def cov_elem(cc):
        # (Q,k,3) -> 3x3 cov entries via axis sums (mean-subtracted)
        x, y, z = cc[..., 0], cc[..., 1], cc[..., 2]
        kk = cc.shape[-2]
        mx = jnp.mean(x, -1); my = jnp.mean(y, -1); mz = jnp.mean(z, -1)
        x = x - mx[..., None]; y = y - my[..., None]; z = z - mz[..., None]
        f = 1.0 / (kk - 1)
        sxx = jnp.sum(x * x, -1) * f
        syy = jnp.sum(y * y, -1) * f
        szz = jnp.sum(z * z, -1) * f
        sxy = jnp.sum(x * y, -1) * f
        sxz = jnp.sum(x * z, -1) * f
        syz = jnp.sum(y * z, -1) * f
        r1 = jnp.stack([sxx, sxy, sxz], -1)
        r2 = jnp.stack([sxy, syy, syz], -1)
        r3 = jnp.stack([sxz, syz, szz], -1)
        return jnp.stack([r1, r2, r3], -2)

    def chain_elem(c):
        def one(args):
            (cc,) = args
            cov = cov_elem(cc)
            lam, n = smallest_eigvec3(cov)
            ref = cc[..., -1, :] - cc[..., 0, :]
            flip = jnp.sum(n * ref, -1) < 0.0
            n = jnp.where(flip[..., None], -n, n)
            # rodrigues rotate, elementwise (a,b,z per neighbor)
            nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
            # R@p with R = I + Kx + Kx^2 (1-c)/s2, v = n x z = (ny, -nx, 0)
            vx, vy = ny, -nx
            s2 = vx * vx + vy * vy
            fac = jnp.where(s2 < 1e-16, 0.0, (1.0 - nz) / jnp.maximum(s2, 1e-20))
            small = jnp.sqrt(s2) < 1e-8
            px, py, pz = cc[..., 0], cc[..., 1], cc[..., 2]
            vxe = vx[..., None]; vye = vy[..., None]
            nze = nz[..., None]; face = fac[..., None]
            # K p = (vy*pz, -vx*pz, vx*py - vy*px) with vz=0
            kp_x = vye * pz
            kp_y = -vxe * pz
            kp_z = vxe * py - vye * px
            # K^2 p = K (K p)
            k2p_x = vye * kp_z
            k2p_y = -vxe * kp_z
            k2p_z = vxe * kp_y - vye * kp_x
            a = px + kp_x + face * k2p_x
            b = py + kp_y + face * k2p_y
            zz = pz + kp_z + face * k2p_z
            sm = small[..., None]
            a = jnp.where(sm, px, a); b = jnp.where(sm, py, b)
            zz = jnp.where(sm, pz, zz)
            # anisotropic scale
            sa = jnp.sqrt(jnp.maximum(jnp.max(a * a, -1), 1e-20))[..., None]
            sb = jnp.sqrt(jnp.maximum(jnp.max(b * b, -1), 1e-20))[..., None]
            a = a / sa; b = b / sb
            # design columns: a2, b2, ab, a, b, 1 ; Gram 6x6 sums
            cols = [a * a, b * b, a * b, a, b, jnp.ones_like(a)]
            G = [[jnp.sum(cols[i] * cols[j], -1) for j in range(6)]
                 for i in range(6)]
            rhs = [jnp.sum(cols[i] * zz, -1) for i in range(6)]
            Gm = jnp.stack([jnp.stack(G[i], -1) for i in range(6)], -2)
            rv = jnp.stack(rhs, -1)
            tr = jnp.trace(Gm, axis1=-2, axis2=-1)
            Gm = Gm + (1e-7 * tr[..., None, None] / 6.0) * jnp.eye(6)
            from pct_tpu.fit.quadratic import cholesky_solve6
            coef = cholesky_solve6(Gm, rv)
            sb1 = sb[..., 0]; sa1 = sa[..., 0]
            scale_back = jnp.stack([
                1.0 / (sa1 * sa1), 1.0 / (sb1 * sb1), 1.0 / (sa1 * sb1),
                1.0 / sa1, 1.0 / sb1, jnp.ones_like(sa1)], -1)
            coef = coef * scale_back
            return explicit_curvatures(coef), n
        curv, nrm = jax.lax.map(one, (c.reshape(-1, TILE, K, 3),))
        return curv.K.reshape(-1).sum() + nrm.sum()

    f1 = jax.jit(chain_current)
    f2 = jax.jit(chain_elem)

    def timeit(f):
        r = f(centered); np.asarray(r)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(centered); np.asarray(r)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = timeit(f1)
    t2 = timeit(f2)
    print(f"einsum chain:      {t1*1e3:8.1f} ms")
    print(f"elementwise chain: {t2*1e3:8.1f} ms")
    # value agreement
    v1 = float(f1(centered)); v2 = float(f2(centered))
    print(f"sums: {v1:.6g} vs {v2:.6g}")


if __name__ == "__main__":
    main()
