"""Verify drive: canonical bunny k=20 pipeline + moments engine k=100.

Run on the REAL TPU (no env overrides). Exercises the public API
end-to-end per .claude/skills/verify: load -> curvature_pipeline ->
write/read PLY round-trip, then the large-k moments engine
(fast_curvature, k=100) on the same scan, cross-checked against the
list-engine chain.
"""

import sys

sys.path.insert(0, "/root/repo")

from pct_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import time  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402

from pct_tpu.core import from_numpy  # noqa: E402
from pct_tpu.io import load_points, read_ply, write_ply  # noqa: E402
from pct_tpu.pipeline import curvature_pipeline  # noqa: E402
from pct_tpu.pipeline.fused import fast_curvature  # noqa: E402

print("devices:", jax.devices(), flush=True)

pts, _ = load_points("/root/reference/sample_scans/bunny.txt")
cloud = from_numpy(pts)
n = int(cloud.num_points)
print(f"bunny n={n}", flush=True)

t0 = time.perf_counter()
r = curvature_pipeline(cloud, k=20)
K = np.asarray(r.curv.K)[:n]
print(f"k=20 pipeline {time.perf_counter()-t0:.1f} s  "
      f"K median {np.median(K):.2f}  nan% {np.mean(~np.isfinite(K))*100:.3f}",
      flush=True)
assert np.isfinite(K).all(), "k=20 K has non-finite entries"
assert 40 < np.median(K) < 70, f"k=20 K median off: {np.median(K)}"

write_ply("/tmp/verify_out.ply", pts, np.asarray(r.normals)[:n],
          vertex_props={"gaussian_curvature": K})
ply = read_ply("/tmp/verify_out.ply")
assert ply.points.shape[0] == n and np.allclose(
    ply.vertex_props["gaussian_curvature"], K, atol=1e-6), \
    "PLY round-trip mismatch"
print("PLY round-trip ok", flush=True)

# changed surface: the tb-batched moments kernel at k=100
t0 = time.perf_counter()
rm = fast_curvature(cloud, k=100)
Km = np.asarray(rm.curv.K)[:n]
exact = float(np.asarray(rm.exact)[:n].mean())
print(f"k=100 moments {time.perf_counter()-t0:.1f} s  "
      f"K median {np.median(Km):.2f}  nan% {np.mean(~np.isfinite(Km))*100:.3f}"
      f"  exact {exact:.4f}", flush=True)
assert np.isfinite(Km).all(), "k=100 moments K has non-finite entries"
assert exact == 1.0, f"k=100 coverage certificate not exact: {exact}"

t0 = time.perf_counter()
rl = curvature_pipeline(cloud, k=100)
Kl = np.asarray(rl.curv.K)[:n]
print(f"k=100 list {time.perf_counter()-t0:.1f} s  "
      f"K median {np.median(Kl):.2f}", flush=True)
scale = np.median(np.abs(Kl)) + 1e-12
med_rel = np.median(np.abs(Km - Kl)) / scale
print(f"moments-vs-list scale-normalized median {med_rel:.2e}", flush=True)
assert med_rel < 5e-3, f"moments/list divergence too big: {med_rel}"

print("VERIFY OK", flush=True)
