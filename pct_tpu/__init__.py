"""pct_tpu — TPU-native discrete-curvature framework for point clouds.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``masnottuh/point-cloud-toolbox`` (CPU numpy/scipy/Open3D toolbox; see SURVEY.md):

- device-resident uniform-grid-hash neighbor search (kNN + epsilon-ball)
  replacing scipy cKDTree per-point query loops (ref pointCloudToolbox.py:69-85)
- batched tangent-frame estimation (3x3 covariance eigensolve, normal
  sign-consistency, Rodrigues rotation) replacing per-point numpy SVD
  (ref pointCloudToolbox.py:270-319)
- fused explicit-quadratic (Monge patch) and implicit-quadric surface fits
  (ref pointCloudToolbox.py:332-396) as batched small-matrix solves
- Gaussian/mean/principal curvature formula layers
  (ref pointCloudToolbox.py:398-480)
- mesh energies (bending, stretching), Taubin smoothing, voxel downsampling
  (ref utils.py:702-765, 319-322; downsample.py)
- analytic-shape validation harness with closed-form oracles
  (ref main_shape_validation.py, utils.py:833-959)
- spatial sharding across a TPU mesh via shard_map/psum (new; the reference
  is single-process single-threaded).

Everything device-side is pure-functional, statically shaped, and jit-safe.
"""

__version__ = "0.1.0"

from pct_tpu.core.cloud import PointCloud  # noqa: F401
