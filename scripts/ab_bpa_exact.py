#!/usr/bin/env python
"""A/B two BPA builds on identical inputs: assert bit-identical faces.

Usage: python scripts/ab_bpa_exact.py <old.so> <new.so> [n_points ...]
"""

import ctypes
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from scripts.bench_bpa_host import sampled_nn, torus  # noqa: E402


def load(path):
    lib = ctypes.CDLL(path)
    lib.bpa_reconstruct.restype = ctypes.c_int
    lib.bpa_reconstruct.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
    ]
    return lib


def run(lib, pts, nrm, radii):
    p = np.ascontiguousarray(pts, np.float32)
    m = np.ascontiguousarray(nrm, np.float32)
    r = np.ascontiguousarray(sorted(radii), np.float32)
    out = ctypes.POINTER(ctypes.c_int32)()
    t0 = time.perf_counter()
    t = lib.bpa_reconstruct(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        p.shape[0], r.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(r), ctypes.byref(out))
    wall = time.perf_counter() - t0
    faces = np.ctypeslib.as_array(out, shape=(t, 3)).copy() if t else \
        np.zeros((0, 3), np.int32)
    return faces, wall


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    sizes = [int(s) for s in sys.argv[3:]] or [300_000]
    from pct_tpu.mesh.reconstruct import bpa_radii_adaptive

    lib_old, lib_new = load(old_path), load(new_path)
    for n in sizes:
        pts, nrm = torus(n)
        nn_d = sampled_nn(pts)
        radii = bpa_radii_adaptive(nn_d)
        dbar = float(nn_d.mean())
        rng = np.random.default_rng(0x5EED)
        ptsj = pts + (0.01 * dbar) * rng.standard_normal(pts.shape).astype(
            np.float32)
        f_old, t_old = run(lib_old, ptsj, nrm, radii)
        f_new, t_new = run(lib_new, ptsj, nrm, radii)
        same = (f_old.shape == f_new.shape
                and bool(np.array_equal(f_old, f_new)))
        print(f"n={n}: old {t_old:6.2f}s {f_old.shape[0]} faces | "
              f"new {t_new:6.2f}s {f_new.shape[0]} faces | "
              f"identical={same}  speedup={t_old/max(t_new,1e-9):.2f}x",
              flush=True)
        if not same:
            print("  !! outputs differ", flush=True)
            sys.exit(1)


if __name__ == "__main__":
    main()
