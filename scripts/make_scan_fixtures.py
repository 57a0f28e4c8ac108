#!/usr/bin/env python
"""Build the scans-driver fixtures: bunny (real scan, 35,947 pts) + a
300k synthetic "scan" (perturbed torus — curvature-adaptive noise, the
reference's perturbation recipe, utils.py:945-950).

The reference's scan protocol is: glob ./Scans/*.ply -> validate_shape
with k=100 and the mesh pipeline (main_scans.py:36-67). These fixtures
let the round re-run that protocol end-to-end on real hardware.

Run: python scripts/make_scan_fixtures.py [outdir=/tmp/scans]
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main(outdir="/tmp/scans"):
    from pct_tpu.io import load_points
    from pct_tpu.io.ply import write_ply
    from pct_tpu.shapes import generate_shape

    os.makedirs(outdir, exist_ok=True)

    bunny_src = "/root/reference/sample_scans/bunny.txt"
    if os.path.exists(bunny_src):
        pts, _ = load_points(bunny_src)
        write_ply(os.path.join(outdir, "bunny.ply"), pts)
        print(f"bunny.ply: {len(pts)} points")

    _, pert = generate_shape("torus", 300_000, radius=1.0,
                             perturbation_strength=0.001 * np.sqrt(4.0),
                             seed=7)
    write_ply(os.path.join(outdir, "synthetic_torus_300k.ply"), pert)
    print(f"synthetic_torus_300k.ply: {len(pert)} points")


if __name__ == "__main__":
    main(*sys.argv[1:])
