"""TPU-native 2D LiDAR graph SLAM framework.

A brand-new JAX/XLA/Pallas implementation of the full pipeline of the C++
reference (Forrest-Z/my-lidar-graph-slam): CARMEN log ingestion, scan
preprocessing, correlative / branch-and-bound / hill-climbing / Gauss-Newton /
grid-search scan matching against occupancy-grid pyramids, log-odds submap
construction via vectorized ray-cast kernels, loop-closure search + detection,
and robust Levenberg-Marquardt pose-graph optimization — redesigned TPU-first:

 * candidate poses x beams are data-parallel lanes of batched gather/reduce
   kernels (not per-beam scalar loops),
 * grid maps are fixed-size dense tensors + origin offsets (not CPU patch
   pagers),
 * the pose-graph solve is a matrix-free block-sparse preconditioned CG
   (not Eigen sparse Cholesky),
 * loop detection fans out over a `jax.sharding.Mesh` with collective
   reductions (not a worker thread).

Reference parity citations in docstrings use `file:line` into the C++ tree.
"""

__version__ = "0.1.0"

from my_lidar_graph_slam_tpu.utils import se2  # noqa: F401
