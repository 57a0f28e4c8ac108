"""Size the dynamic-run-packing lever: per-bucket candidate budget
M = max over member cells of TOTAL group-aligned run length, vs today's
M = 9 * run_cap (per-run static spans sized by the bucket max run).

Prints both layouts' M and total query-candidate pairs for the 1M torus
at k in {20, 100}.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from pct_tpu.core import from_numpy  # noqa: E402
from pct_tpu.neighbors.cellknn import (  # noqa: E402
    PAD_ID,
    _cand_m,
    _cand_pack,
    _runs_table,
    compact_cells,
    probe_grid_buckets,
)
from pct_tpu.neighbors.grid import build_grid, estimate_cell_size  # noqa: E402
from pct_tpu.shapes import generate_shape  # noqa: E402


def r8(x):
    return max(8, ((x + 7) // 8) * 8)


def main():
    N = 1_000_000
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)
    n = cloud.points.shape[0]
    for k, cap, packs in ((20, 256, (1,)), (100, 400, (8,))):
        cell = estimate_cell_size(cloud.points, cloud.num_points, k)
        grid = build_grid(cloud.points, cloud.num_points, cell)
        spec, mc = probe_grid_buckets(grid, capacity_cap=cap)
        cells = compact_cells(grid, mc)
        rs, run_len = _runs_table(grid, cells)
        run_len = np.asarray(run_len)
        rs = np.asarray(rs)
        counts = np.asarray(cells.count)
        key = np.maximum(counts, (run_len.sum(axis=1) + 26) // 27)
        valid = np.asarray(cells.cell_id) != PAD_ID
        pack = packs[0] if packs[0] else _cand_pack(n)
        print(f"== k={k} pack={pack} buckets={len(spec)}")
        lo = 0
        told = tnew = 0
        for sp in spec:
            member = valid & (key > lo)
            if sp is not spec[-1]:
                member &= key <= sp.hi_key
            lo = sp.hi_key
            # pre-change static layout: per-run spans of the bucket's
            # 8-rounded max run, group-rounded (the old _cand_m)
            run_cap_old = r8(int(run_len[member].max(initial=1)))
            rl = np.minimum(run_len[member], run_cap_old)
            off = rs[member] % pack
            groups = np.where(rl > 0, -(-(off + rl) // pack), 0)
            tot = (groups * pack).sum(axis=1)             # slots, packed rows
            gc_old = (run_cap_old + 2 * pack - 2) // pack
            m_old = 9 * (gc_old * pack if pack > 1 else run_cap_old)
            m_new = _cand_m(sp.cand_cap, pack)
            nc = int(member.sum())
            told += nc * sp.capacity * m_old
            tnew += nc * sp.capacity * m_new
            print(f"  cap={sp.capacity:4d} cells={nc:6d} M_old={m_old:5d} "
                  f"M_new={m_new:5d} mean_tot={tot.mean():7.0f} "
                  f"p99_tot={np.percentile(tot, 99):7.0f}")
        print(f"  pairs old={told/1e9:.2f}G new={tnew/1e9:.2f}G "
              f"ratio={told/max(tnew,1):.2f}x")


if __name__ == "__main__":
    main()
