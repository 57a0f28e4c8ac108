#!/usr/bin/env python
"""Cyclide BPA ladder A/B: push F/V toward 2.0 (VERDICT r4 ask #6).

Open3D is NOT importable in this image (checked round 5), so the
reference-side A/B cannot run; instead this harness isolates the
first-party BPA's controllable knobs — the radius ladder — on the
identical 8k cyclide and measures reconstruction quality per variant.
Normals are computed ONCE (they are ladder-independent), then each
variant runs bpa + the pipeline's exact hole-fill protocol.

Metrics per variant: F/V (2.0 = closed manifold), largest-component
face fraction, boundary-edge fraction, boundary loops, wall seconds.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def quality(faces, n):
    from pct_tpu.mesh.boundary import detect_boundary_loops

    if faces.size == 0:
        return {"faces": 0, "f_over_v": 0.0}
    v_ref = np.unique(faces)
    edges = np.sort(faces[:, [0, 1, 1, 2, 2, 0]].reshape(-1, 2), axis=1)
    uniq, cnt = np.unique(edges, axis=0, return_counts=True)
    from cyclide_report import component_fractions

    return {
        "faces": int(len(faces)),
        "f_over_v": round(len(faces) / max(len(v_ref), 1), 4),
        "largest_comp": round(component_fractions(faces), 4),
        "boundary_edge_frac": round(
            float((cnt == 1).sum() / max(len(uniq), 1)), 4),
        "boundary_loops": int(len(detect_boundary_loops(faces))),
        "nonmanifold_edge_frac": round(
            float((cnt > 2).sum() / max(len(uniq), 1)), 4),
    }


def run_variant(pts, normals, radii, dbar):
    from pct_tpu.mesh.boundary import fill_holes_by_size, fill_small_holes
    from pct_tpu.mesh.reconstruct import ball_pivoting, cleanup_mesh

    t0 = time.time()
    faces = cleanup_mesh(ball_pivoting(pts, normals, radii,
                                       degeneracy_jitter=0.01,
                                       mean_spacing=dbar))
    for _ in range(2):
        faces, _n = fill_small_holes(pts, faces)
    faces = cleanup_mesh(faces.astype(np.int32))
    bbox = pts.max(0) - pts.min(0)
    faces, _n = fill_holes_by_size(pts, faces,
                                   hole_size=float(bbox.mean()) / 10.0)
    faces = cleanup_mesh(faces.astype(np.int32))
    q = quality(faces, len(pts))
    q["wall_s"] = round(time.time() - t0, 2)
    return q


def main(n=8000, seed=0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "/root/repo/scripts")

    from pct_tpu.core import from_numpy
    from pct_tpu.mesh.normals import estimate_and_orient_normals
    from pct_tpu.mesh.reconstruct import bpa_radii_adaptive
    from pct_tpu.neighbors.bruteforce import sampled_nn_distances
    from pct_tpu.shapes import generate_shape

    pts, _ = generate_shape("dupin_cyclide", int(n), radius=1.0,
                            seed=int(seed))
    pts = np.asarray(pts, np.float32)
    cloud = from_numpy(pts)
    nc = int(cloud.num_points)
    normals = np.asarray(estimate_and_orient_normals(
        cloud, k=min(50, nc - 1)))[:nc]
    nn_d = np.asarray(sampled_nn_distances(cloud.points, cloud.num_points))
    d = nn_d[np.isfinite(nn_d) & (nn_d > 0)]
    dbar = float(d.mean())
    med, mx = float(np.median(d)), float(d.max())
    p10 = float(np.percentile(d, 10))
    base = bpa_radii_adaptive(nn_d)

    variants = {
        "adaptive(base)": base,
        "lo=p10": np.geomspace(p10, base[-1], len(base) + 4),
        "lo=p10/2": np.geomspace(p10 / 2, base[-1], len(base) + 8),
        "lo=min": np.geomspace(max(float(d.min()), 1e-6), base[-1], 25),
        "dense25": np.geomspace(med, base[-1], 25),
        "dense50": np.geomspace(p10 / 2, base[-1], 50),
        "hi=4max": np.geomspace(p10, 4 * mx, 32),
    }
    print(json.dumps({"n": n, "med": med, "max": mx, "p10": p10,
                      "dbar": dbar, "base_rungs": len(base),
                      "base_lo": float(base[0]),
                      "base_hi": float(base[-1])}), flush=True)
    for name, radii in variants.items():
        q = run_variant(pts, normals, np.asarray(radii, np.float32), dbar)
        print(json.dumps({"variant": name, "rungs": len(radii), **q}),
              flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
