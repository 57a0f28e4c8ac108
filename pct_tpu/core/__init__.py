from pct_tpu.core.cloud import PointCloud, from_numpy, to_numpy, pad_capacity  # noqa: F401
