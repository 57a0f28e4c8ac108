"""Estimate chunk-skip potential in the moments kernel (HISTORICAL).

Analyzed the PRE-dynamic-run-packing static layout (9 per-run spans of
the bucket max run): fraction of (tb-block, chunk) pairs with NO valid
candidate slot — chunks a validity-predicated kernel could skip — vs
kernel chunk size, with/without aligning run spans to chunk boundaries.
MEASURED DEAD END: <=25% pair cut at 8x more loop iterations even with
run-length-sorted blocks; the analysis instead motivated dynamic run
packing (see _tile_candidates), which removed the structural padding
this script hoped to skip. Kept runnable (reconstructs the old layout
inline from the runs table).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from pct_tpu.core import from_numpy  # noqa: E402
from pct_tpu.neighbors.cellknn import (  # noqa: E402
    PAD_ID,
    _cand_pack,
    _runs_table,
    compact_cells,
    probe_grid_buckets,
)
from pct_tpu.neighbors.grid import build_grid, estimate_cell_size  # noqa: E402
from pct_tpu.shapes import generate_shape  # noqa: E402


def main(k=100):
    N = 1_000_000
    pts, _ = generate_shape("torus", N, radius=1.0)
    cloud = from_numpy(pts, pad_multiple=1 << 16)
    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    spec, mc = probe_grid_buckets(grid, capacity_cap=400)
    cells = compact_cells(grid, mc)
    rs, run_len = _runs_table(grid, cells)
    run_len = np.asarray(run_len)
    rs = np.asarray(rs)
    counts = np.asarray(cells.count)
    key = np.maximum(counts, (run_len.sum(axis=1) + 26) // 27)
    valid = np.asarray(cells.cell_id) != PAD_ID
    pack = _cand_pack(cloud.points.shape[0])

    lo = 0
    for sp in spec:
        member = valid & (key > lo)
        if sp is not spec[-1]:
            member &= key <= sp.hi_key
        lo = sp.hi_key
        # old static layout, reconstructed: per-run spans of the
        # bucket's 8-rounded max run, group-rounded
        run_cap = max(8, (int(run_len[member].max(initial=1)) + 7) // 8 * 8)
        rl = np.minimum(run_len[member], run_cap)          # (nc, 9)
        off = rs[member] % pack                            # within-group
        if len(sys.argv) > 1 and sys.argv[1] == "sort":
            o = np.argsort(-rl.max(axis=1), kind="stable")
            rl, off = rl[o], off[o]
        # valid slots per run in the packed layout: off .. off+len
        gc = (run_cap + 2 * pack - 2) // pack
        span = gc * pack
        nc = rl.shape[0]
        print(f"bucket cap={sp.capacity} run_cap={run_cap} span={span} "
              f"cells={nc} mean_len={rl.mean():.0f}")
        for chunk in (1024, 512, 256, 128):
            for align in (False, True):
                sp_r = ((span + chunk - 1) // chunk) * chunk if align else span
                m = 9 * sp_r
                mp = ((m + chunk - 1) // chunk) * chunk
                g = mp // chunk
                # slot validity intervals per run: [r*sp_r+off, r*sp_r+off+len)
                starts = (np.arange(9) * sp_r)[None, :] + off
                ends = starts + rl
                # chunk c covers [c*chunk, (c+1)*chunk); active iff any run
                # interval intersects
                cs = np.arange(g) * chunk
                act = np.zeros((nc, g), bool)
                for r in range(9):
                    s, e = starts[:, r][:, None], ends[:, r][:, None]
                    act |= (s < cs[None, :] + chunk) & (e > cs[None, :])
                for tb in (8,):
                    pad = (-nc) % tb
                    a = np.concatenate([act, np.zeros((pad, g), bool)])
                    blk = a.reshape(-1, tb, g).any(1)
                    # work model: active chunks scanned, relative to today
                    # (all g chunks at align=False)
                    frac = blk.mean()
                    print(f"  chunk={chunk:5d} align={int(align)} g={g:3d} "
                          f"active_frac={frac:.3f} "
                          f"scanned_pairs_rel={frac * g * chunk / (9 * span):.3f}")


if __name__ == "__main__":
    main()
