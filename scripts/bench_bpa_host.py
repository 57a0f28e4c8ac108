"""Host-only BPA A/B benchmark — no JAX, no TPU.

Generates a random-sampled torus with analytic normals, derives the
spread-aware radii ladder the mesh pipeline would use, and times the
native ball_pivoting call. Reports triangles, Euler characteristic and
orphan fraction so optimization A/Bs can assert quality is unchanged.

Usage: python scripts/bench_bpa_host.py [n_points] [jitter]
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")  # before any pct_tpu import

import numpy as np


def torus(n, R=1.0, r=1.0 / 3.0, seed=0):
    rng = np.random.default_rng(seed)
    # rejection-sample v for uniform area density on the tube
    u = rng.uniform(0, 2 * np.pi, int(n * 1.6))
    v = rng.uniform(0, 2 * np.pi, int(n * 1.6))
    keep = rng.uniform(0, 1, v.shape) < (R + r * np.cos(v)) / (R + r)
    u, v = u[keep][:n], v[keep][:n]
    assert u.size == n
    x = (R + r * np.cos(v)) * np.cos(u)
    y = (R + r * np.cos(v)) * np.sin(u)
    z = r * np.sin(v)
    pts = np.stack([x, y, z], -1).astype(np.float32)
    nx = np.cos(v) * np.cos(u)
    ny = np.cos(v) * np.sin(u)
    nz = np.sin(v)
    nrm = np.stack([nx, ny, nz], -1).astype(np.float32)
    return pts, nrm


def sampled_nn(pts, m=512, seed=1):
    rng = np.random.default_rng(seed)
    idx = rng.choice(pts.shape[0], size=min(m, pts.shape[0]), replace=False)
    q = pts[idx].astype(np.float32)
    best = np.full(q.shape[0], np.inf, np.float32)
    q2 = (q * q).sum(-1)
    for lo in range(0, pts.shape[0], 131072):
        blk = pts[lo:lo + 131072]
        d2 = q2[:, None] + (blk * blk).sum(-1)[None, :] - 2.0 * (q @ blk.T)
        d2[d2 < 1e-12] = np.inf
        best = np.minimum(best, d2.min(1))
    return np.sqrt(np.maximum(best, 0.0)).astype(np.float64)


def euler_char(faces, n_used):
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [0, 2]]])
    edges = np.unique(np.sort(edges, 1), axis=0)
    return n_used - edges.shape[0] + faces.shape[0]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    from pct_tpu.mesh.reconstruct import ball_pivoting, bpa_radii_adaptive

    pts, nrm = torus(n)
    nn_d = sampled_nn(pts)
    dbar = float(nn_d.mean())
    radii = bpa_radii_adaptive(nn_d)
    print(f"n={n} dbar={dbar:.5f} ladder={len(radii)} rungs "
          f"[{radii[0]:.5f}..{radii[-1]:.5f}]")

    t0 = time.perf_counter()
    faces = ball_pivoting(pts, nrm, radii, degeneracy_jitter=0.01,
                          mean_spacing=dbar)
    t = time.perf_counter() - t0
    used = np.unique(faces)
    chi = euler_char(faces, used.size)
    print(f"bpa_seconds={t:.2f} faces={faces.shape[0]} "
          f"used={used.size}/{n} orphan_frac={1 - used.size / n:.4f} "
          f"euler_char={chi}")


if __name__ == "__main__":
    main()
