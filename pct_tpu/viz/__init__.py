from pct_tpu.viz.plots import (  # noqa: F401
    plot_points_colored_by_curvature,
    plot_pca_curvature,
    plot_surface,
    visualize_knn_for_random_points,
)
from pct_tpu.viz.results import (  # noqa: F401
    load_results,
    plot_curvature_histograms,
    plot_disp_energies,
    plot_error_scatter,
)
from pct_tpu.viz.view import view_figs, view_meshes  # noqa: F401
