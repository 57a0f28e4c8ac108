"""Select-kernel scoped-VMEM plan regression tests.

Round-4 in-the-wild failure (sweep_r4_200k_perturbed.csv): the k=50
normals-stage select on perturbed clouds compiled a
(tile=128, C=192..208, k=50) static whose Mosaic scoped-VMEM working set
(21.51 MB) exceeded the 16 MB default — the old guard modeled only
``capacity * cand_cap * 12`` (3.7 MB for that config) and admitted it.
These tests pin the corrected model (`_select_scoped_bytes`), the plan
(`_select_plan`: block shrink + raised vmem_limit), the routing helper
(`pallas_select_ok`: also rejects the Mosaic compile-hazard class), and
end-to-end interpret-mode correctness at a hostile static.

CPU cannot reproduce the OOM itself (CLAUDE.md: Mosaic issues are
TPU-only) — what CPU CAN pin is that the plan logic admits/demotes the
right configs and that the kernel stays correct at every block size the
plan can choose.
"""

import jax.numpy as jnp
import numpy as np

from pct_tpu.core import from_numpy
from pct_tpu.neighbors.cellknn import (
    _SELECT_VMEM_DEFAULT,
    _SELECT_VMEM_RAISED,
    _select_plan,
    _select_scoped_bytes,
    _working_set_guards,
    knn_cellwise,
    pallas_select_ok,
    probe_grid,
)
from pct_tpu.neighbors.grid import build_grid, estimate_cell_size
from pct_tpu.shapes import generate_shape

MB = 1 << 20


def test_scoped_model_flags_round4_oom_class():
    """The round-4 OOM static (block=8, C=192, M~1600, k=50) must be
    modeled OVER the 16 MB default budget — the old formula
    (C*M*4*3 = 3.7 MB <= 10 MB) admitted it and the sweep row died with
    'scoped allocation 21.51M > 16.00M'."""
    est = _select_scoped_bytes(8, 192, 1600, 50)
    assert est > 16 * MB                      # new model: over budget
    assert abs(est - 21.51 * MB) < 2.5 * MB   # ... and near the observed
    assert 192 * 1600 * 4 * 3 <= 10 * MB      # old formula: admitted (bug)


def test_plan_keeps_headline_class_byte_identical():
    """Headline k=20 bucket statics must keep (block=8, no CompilerParams)
    so their cached compiled programs — and measured perf — are
    untouched by the plan."""
    for c, m in [(32, 300), (64, 600), (128, 1200)]:
        assert _select_plan(c, m, 20) == (8, None)


def test_plan_raises_limit_for_oom_class():
    """The failing perturbed-sweep statics get block=8 with the raised
    Mosaic budget, and their modeled working set fits under it with the
    25% safety margin."""
    for c in (192, 208):
        block, limit = _select_plan(c, 1600, 50)
        assert block == 8 and limit == _SELECT_VMEM_RAISED
        assert _select_scoped_bytes(block, c, 1600, 50) <= (limit * 3) // 4


def test_plan_never_returns_sub8_blocks():
    """Round-5 in-the-wild lowering failure: sub-8 block_cells put a
    non-multiple-of-8 extent on the SUBLANE axis, which Mosaic refuses
    to lower ("block shape (1, 256)", r=1000 Perturbed voter selects).
    The plan must return block=8 or no plan at all — overflow demotes
    to the XLA path instead of shrinking the block."""
    for c, m, k in [(64, 600, 20), (192, 1600, 50), (256, 8000, 50),
                    (256, 12000, 12), (512, 200_000, 100)]:
        block, limit = _select_plan(c, m, k)
        assert block in (8, None), (c, m, k, block)
    # something absurd must return no plan at all
    assert _select_plan(512, 200_000, 100) == (None, None)
    # ... and the routing helper must reject it (guards then demote)
    assert not pallas_select_ok(256, 200_000, 12)


def test_hazard_class_demoted_to_xla():
    """(64,144,50)/M=4016 — the static that compiled 34 min in Mosaic —
    must be rejected by the routing helper and demoted by the guards,
    while a benign k=50 static stays on pallas."""
    assert not pallas_select_ok(64, 4016, 50)
    _, impl = _working_set_guards(64, 128, 4016, "pallas", k=50)
    assert impl == "xla"
    # the round-4 OOM class (C=192, M~1600-1900, k=50) is ALSO a
    # compile sink (32 min in the r4 sweep, >20 min reproduced round 5
    # with the raised vmem limit) — it must demote too
    assert not pallas_select_ok(192, 1600, 50)
    _, impl = _working_set_guards(192, 128, 1600, "pallas", k=50)
    assert impl == "xla"
    # a genuinely small k=50 static stays on pallas
    assert pallas_select_ok(64, 900, 50)
    _, impl = _working_set_guards(64, 128, 900, "pallas", k=50)
    assert impl == "pallas"
    # k < 32 (headline class) is exempt from the compile-hazard cap
    assert pallas_select_ok(64, 4016, 20)


def test_select_correct_at_hostile_static_interpret():
    """End-to-end kNN at the hostile (capacity~200, k=50) static through
    the pallas kernel (interpret mode picks up the SAME plan the TPU
    path would: raised vmem_limit, block from the plan) must match the
    XLA select path winner-for-winner."""
    pts, _ = generate_shape("torus", 2000, radius=1.0)
    cloud = from_numpy(pts)
    k = 50
    cell = estimate_cell_size(cloud.points, cloud.num_points, k)
    grid = build_grid(cloud.points, cloud.num_points, cell)
    cells, _cap, _mc, _cc = probe_grid(grid)
    kw = dict(capacity=200, cand_cap=1600, k=k)
    r_p = knn_cellwise(grid, cells, select_impl="pallas_interpret", **kw)
    r_x = knn_cellwise(grid, cells, select_impl="xla", **kw)
    n = 2000
    np.testing.assert_allclose(np.asarray(r_p.dists)[:n],
                               np.asarray(r_x.dists)[:n],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(r_p.exact)[:n],
                                  np.asarray(r_x.exact)[:n])
    assert np.asarray(r_p.exact)[:n].mean() > 0.99


def test_select_rows_kernel_matches_across_block_sizes(rng):
    """The kernel must return identical winners at every block size the
    plan can choose (1/2/4/8), including a T not divisible by the
    block."""
    from pct_tpu.ops.pallas_select import knn_select_rows

    T, C, M, K = 6, 8, 48, 5
    q = rng.standard_normal((T, C, 3)).astype(np.float32)
    p = rng.standard_normal((T, M, 3)).astype(np.float32)
    cand = np.stack([rng.permutation(500)[:M] for _ in range(T)]
                    ).astype(np.int32)
    qrow = cand[:, :C].copy()
    valid = (rng.random((T, M)) < 0.85).astype(np.int32)
    args = tuple(jnp.asarray(a) for a in (q, p, cand, qrow, valid))
    d8, r8 = knn_select_rows(*args, K, interpret=True)
    for block in (1, 2, 4):
        db, rb = knn_select_rows(*args, K, block_cells=block,
                                 interpret=True,
                                 vmem_limit=_SELECT_VMEM_RAISED)
        np.testing.assert_array_equal(np.asarray(rb), np.asarray(r8))
        np.testing.assert_allclose(np.asarray(db), np.asarray(d8),
                                   rtol=2e-6, atol=0)
