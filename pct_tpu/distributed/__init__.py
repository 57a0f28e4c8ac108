from pct_tpu.distributed.sharding import (  # noqa: F401
    POINTS_AXIS,
    ShardedResult,
    make_mesh,
    sharded_curvature,
)
from pct_tpu.distributed.slab import (  # noqa: F401
    SlabResult,
    slab_curvature,
    slab_curvature_unsorted,
)
from pct_tpu.distributed.sort import (  # noqa: F401
    DistGrid,
    build_grid_distributed,
)
