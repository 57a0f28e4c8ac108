from pct_tpu.mesh.energies import (  # noqa: F401
    MeshEnergies,
    mesh_energies,
    mesh_vertex_curvatures,
    triangle_areas,
    vertex_areas,
)
from pct_tpu.mesh.smooth import taubin_smooth, mesh_edges  # noqa: F401
from pct_tpu.mesh.boundary import (  # noqa: F401
    boundary_edges,
    detect_boundary_loops,
    fill_small_holes,
    is_planar,
)
from pct_tpu.mesh.downsample import voxel_downsample  # noqa: F401
from pct_tpu.mesh.normals import (  # noqa: F401
    estimate_and_orient_normals,
    estimate_raw_normals,
    orient_normals,
)
