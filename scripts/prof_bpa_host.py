#!/usr/bin/env python
"""Section-level profile of the host BPA (-DBPA_PROF build).

Builds a separate instrumented .so (rdtsc counters around pivot /
ball_empty / find_seed / grid build — see bpa.cpp's BPA_PROF hooks),
runs the same random torus as bench_bpa_host.py, and prints the
counter report. Keeps the production .so untouched.

Usage: python scripts/prof_bpa_host.py [n_points]
"""

import ctypes
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")  # before any pct_tpu import

import numpy as np  # noqa: E402

from scripts.bench_bpa_host import sampled_nn, torus  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from pct_tpu.mesh import reconstruct as rec
    from pct_tpu.mesh.reconstruct import bpa_radii_adaptive

    src = rec._SRC
    lib_path = "/tmp/libbpa_prof.so"
    cmd = ["g++", "-O3", "-march=native", "-DBPA_PROF", "-shared", "-fPIC",
           "-std=c++17", src, "-o", lib_path]
    subprocess.run(cmd, check=True)
    lib = ctypes.CDLL(lib_path)
    lib.bpa_reconstruct.restype = ctypes.c_int
    lib.bpa_reconstruct.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
    ]

    pts, nrm = torus(n)
    nn_d = sampled_nn(pts)
    radii = bpa_radii_adaptive(nn_d)
    dbar = float(nn_d.mean())
    rng = np.random.default_rng(0x5EED)
    pts = pts + (0.01 * dbar) * rng.standard_normal(pts.shape).astype(
        np.float32)

    p = np.ascontiguousarray(pts, np.float32)
    m = np.ascontiguousarray(nrm, np.float32)
    r = np.ascontiguousarray(sorted(radii), np.float32)
    out = ctypes.POINTER(ctypes.c_int32)()
    t0 = time.perf_counter()
    t = lib.bpa_reconstruct(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, r.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(r), ctypes.byref(out))
    wall = time.perf_counter() - t0
    print(f"n={n} faces={t} wall={wall:.2f}s (instrumented build)")
    lib.bpa_prof_print()


if __name__ == "__main__":
    main()
