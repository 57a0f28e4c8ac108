from pct_tpu.validate.harness import (  # noqa: F401
    ValidationResult,
    percent_error,
    point_area_weights,
    validate_cloud,
    validate_file,
    zscore_filter,
)
from pct_tpu.validate.sweep import run_sweep  # noqa: F401
from pct_tpu.validate.scans import run_scans  # noqa: F401
