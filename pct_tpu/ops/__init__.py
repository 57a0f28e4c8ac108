from pct_tpu.ops.pallas_select import knn_select  # noqa: F401
from pct_tpu.ops.pallas_band import knn_band_select  # noqa: F401
