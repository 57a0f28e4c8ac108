from pct_tpu.curvature.explicit import Curvatures, explicit_curvatures  # noqa: F401
from pct_tpu.curvature.implicit import implicit_curvatures  # noqa: F401
from pct_tpu.curvature.pca import (  # noqa: F401
    PCACurvatures,
    pca_principal_curvatures,
    surface_variation,
)
