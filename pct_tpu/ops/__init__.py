from pct_tpu.ops.pallas_select import knn_select  # noqa: F401

