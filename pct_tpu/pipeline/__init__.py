from pct_tpu.pipeline.curvature_pipeline import (  # noqa: F401
    PipelineResult,
    compute_pointwise_explicit_quadratic_curvature,
    compute_pointwise_implicit_quadric_curvature,
    curvature_pipeline,
    pointwise_curvature,
)
from pct_tpu.pipeline.fused import (  # noqa: F401
    FusedResult,
    fast_curvature,
    fused_curvature,
)
from pct_tpu.pipeline.neighbor_study import (  # noqa: F401
    explicit_quadratic_neighbor_study,
)
