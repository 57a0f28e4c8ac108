#!/usr/bin/env python
"""Dupin-cyclide reconstruction quality artifact (VERDICT r3 item 9).

The cyclide is the BPA stress shape (strongly non-uniform sampling, ~20x
spacing spread — ref .MISSING_LARGE_BLOBS dupin_cyclide.txt). A closed
watertight reconstruction has F/V -> 2.0 (Euler); the adaptive radius
ladder reached ~1.58 in round 3. This script quantifies the remaining
gap with stable metrics so the next round can tell progress from noise:

  faces/vertices ratio, referenced-vertex fraction, largest connected
  component fraction (by faces), boundary loop count, boundary edge
  fraction.

Writes cyclide_recon.json next to the repo CSV artifacts. CPU/host only
(the BPA is first-party C++); runs in seconds at 8k.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def component_fractions(faces: np.ndarray) -> float:
    """Fraction of faces in the largest face-connected component
    (union-find over shared edges)."""
    if faces.size == 0:
        return 0.0
    parent = np.arange(len(faces))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    edge_to_face = {}
    for fi, (a, b, c) in enumerate(faces):
        for e in ((a, b), (b, c), (c, a)):
            key = (min(e), max(e))
            if key in edge_to_face:
                ra, rb = find(edge_to_face[key]), find(fi)
                if ra != rb:
                    parent[ra] = rb
            else:
                edge_to_face[key] = fi
    roots = np.array([find(i) for i in range(len(faces))])
    _, counts = np.unique(roots, return_counts=True)
    return float(counts.max() / len(faces))


def main(n=8000, seed=0):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from pct_tpu.mesh.boundary import detect_boundary_loops
    from pct_tpu.pipeline.mesh_pipeline import create_mesh_with_curvature
    from pct_tpu.shapes import generate_shape

    pts, _ = generate_shape("dupin_cyclide", n, radius=1.0, seed=seed)
    mesh = create_mesh_with_curvature(pts, k_neighbors=20,
                                      smooth_iterations=0)
    faces = np.asarray(mesh.faces)
    v_ref = np.unique(faces) if faces.size else np.array([], np.int64)
    loops = detect_boundary_loops(faces)
    # boundary edge fraction: edges on exactly one face / all edges
    edges = np.sort(faces[:, [0, 1, 1, 2, 2, 0]].reshape(-1, 2), axis=1)
    uniq, cnt = np.unique(edges, axis=0, return_counts=True)
    report = {
        "shape": "dupin_cyclide", "n_points": int(n), "seed": int(seed),
        "faces": int(len(faces)),
        "vertices_referenced": int(len(v_ref)),
        "f_over_v": round(len(faces) / max(len(v_ref), 1), 4),
        "referenced_fraction": round(len(v_ref) / n, 4),
        "largest_component_face_fraction": round(
            component_fractions(faces), 4),
        "boundary_loops": int(len(loops)),
        "boundary_edge_fraction": round(
            float((cnt == 1).sum() / max(len(uniq), 1)), 4),
        "holes_filled_by_pipeline": int(mesh.n_holes_filled),
        "stage_seconds": mesh.timings,
    }
    out = "/root/repo/cyclide_recon.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
