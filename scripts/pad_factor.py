"""Size the static-shape padding waste of the bucketed k=100 layout.

Prints, for the 1M torus at the bench's k=100 probe settings: per bucket
(cells, capacity, cand_cap, M) and the aggregate ratios the kernel pays —
padded query rows / valid points, and query-candidate pair-elements /
(valid points × one run's candidates) — i.e. how much of the moment
kernel's work is structural padding vs irreducible overfetch.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from pct_tpu.core import from_numpy  # noqa: E402
from pct_tpu.neighbors.cellknn import (  # noqa: E402
    _cand_m,
    _cand_pack,
    compact_cells,
    probe_grid_buckets,
)
from pct_tpu.neighbors.grid import build_grid, estimate_cell_size  # noqa: E402
from pct_tpu.shapes import generate_shape  # noqa: E402


def main(k=100, cap=400, split_to=None):
    N = 1_000_000
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)
    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    kw = dict(capacity_cap=cap)
    if split_to:
        kw["split_to"] = split_to
    out = probe_grid_buckets(grid, **kw)
    spec = out[0]
    cells = compact_cells(grid, out[1])
    counts = np.asarray(cells.count)
    valid = np.asarray(cells.cell_id) != np.iinfo(np.int32).max
    nv = int(np.asarray(grid.num_valid))
    pack = _cand_pack(cloud.points.shape[0])
    print(f"k={k} valid_points={nv} occupied_cells={valid.sum()} "
          f"mean_occ={counts[valid].mean():.1f} pack={pack}")
    tot_rows = tot_pairs = 0
    for sp in spec:
        m = _cand_m(sp.cand_cap, pack)
        rows = sp.max_cells * sp.capacity
        pairs = rows * m
        tot_rows += rows
        tot_pairs += pairs
        print(f"  bucket hi_key={sp.hi_key:4d} cells={sp.max_cells:7d} "
              f"cap={sp.capacity:4d} cand_cap={sp.cand_cap:4d} M={m:5d} "
              f"rows={rows/1e6:.2f}M pairs={pairs/1e9:.2f}G")
    print(f"TOTAL padded rows {tot_rows/1e6:.2f}M  = {tot_rows/nv:.2f}x valid")
    print(f"TOTAL pairs {tot_pairs/1e9:.2f}G  "
          f"= {tot_pairs/nv:.0f} per valid point (k={k} needed)")


if __name__ == "__main__":
    import sys

    split = int(sys.argv[1]) if len(sys.argv) > 1 else None
    main(split_to=split)
