"""k=100 pipeline time vs occupancy-bucket count (1M torus, TPU).

The flat stats rows the moments epilogue (and kernel C axis) pay for
include each bucket's capacity padding — 1.70M rows for 1.05M points
at the default max_buckets=3 (62% overhead). Finer buckets tighten
capacities at the cost of more kernel programs (per-call overhead +
compiles). This script times the full fused moments pipeline across
max_buckets settings to find the knee.

Usage: micro_buckets_k100.py [k] [mb mb ...]   (defaults: 100, 3 4 5 6)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from pct_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402

from pct_tpu.core import from_numpy  # noqa: E402
from pct_tpu.neighbors.cellknn import probe_grid_buckets  # noqa: E402
from pct_tpu.neighbors.grid import build_grid, estimate_cell_size  # noqa: E402
from pct_tpu.pipeline.fused import fused_curvature  # noqa: E402
from pct_tpu.shapes import generate_shape  # noqa: E402

N = 1_000_000
K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
MBS = [int(a) for a in sys.argv[2:]] or [3, 4, 5, 6]
ENGINE = "moments" if K >= 64 else "list"

print("devices:", jax.devices(), "k:", K, "engine:", ENGINE, flush=True)
pts, _ = generate_shape("torus", N, radius=1.0)
cloud = from_numpy(pts, pad_multiple=1 << 16)
p, npts = cloud.points, cloud.num_points
cell0 = estimate_cell_size(p, npts, K)
grid0 = build_grid(p, npts, cell0)


def sync(x):
    np.asarray(x.ravel()[0:1])


base_K = None
for mb in MBS:
    cap_cap = 400 if K >= 64 else max(256, 4 * K)
    spec, mc = probe_grid_buckets(grid0, capacity_cap=cap_cap,
                                  max_buckets=mb)
    rows = sum(sp.max_cells * sp.capacity for sp in spec)
    print(f"max_buckets={mb}: spec={[tuple(sp) for sp in spec]} "
          f"mc={mc} flat_rows={rows}", flush=True)

    def run(spec=spec, mc=mc):
        cell = estimate_cell_size(p, npts, K)
        return fused_curvature(p, npts, cell, k=K, max_cells=mc,
                               bucket_spec=spec, engine=ENGINE)

    r = run()
    sync(r.curv.K)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = run()
        sync(r.curv.K)
        ts.append(time.perf_counter() - t0)
    Kv = np.asarray(r.curv.K)[:N]
    exact = float(np.asarray(r.exact)[:N].mean())
    if base_K is None:
        base_K = Kv
        dmax = 0.0
    else:
        dmax = float(np.max(np.abs(Kv - base_K)))
    print(f"  steady {min(ts)*1e3:7.1f} ms   exact {exact:.4f}   "
          f"maxdiff-vs-mb3 {dmax:.2e}", flush=True)
