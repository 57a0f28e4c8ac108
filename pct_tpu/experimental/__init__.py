"""Measured dead ends kept for the post-mortem record, NOT production.

``pallas_band`` + ``band_knn``: the gather-free DMA-band kNN. Verified
in interpret mode, but (a) Mosaic's 1024-element f32 alignment rule for
1D DMA offsets blocks it from compiling on real TPUs, and (b) even if
it compiled, its selection scans the whole 9·band ≈ 5.7k-wide candidate
window per query vs the compacted ~500 of the production cell loop —
measured slower by construction. See README "dead ends" and the module
docstrings.
"""
