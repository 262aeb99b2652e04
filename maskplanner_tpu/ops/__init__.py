"""Device-resident geometric ops (XLA + Pallas).

These replace the reference's native dependencies with TPU-native code:
- pytorch3d ``knn_points`` CUDA kernels -> masked pairwise-distance + top-k
  (``distance``, ``chamfer``; reference pytorch3d_chamfer.py:12).
- scipy ``linear_sum_assignment`` host LAP -> on-device Jonker-Volgenant
  (``hungarian``; reference loss_handler.py:875, models/hungarianMatcher.py:61).
- PointNet++ python-loop FPS / sort-based ball query -> ``lax`` scan + top-k
  (``sampling``; reference models/pointnet2_utils.py:65-109).
"""
from .distance import square_distance, masked_square_distance
from .chamfer import chamfer_distance, lengths_from_padding, mask_from_padding
from .sampling import farthest_point_sample, query_ball_point, knn, index_points
from .hungarian import hungarian, hungarian_cost

__all__ = [
    "square_distance",
    "masked_square_distance",
    "chamfer_distance",
    "lengths_from_padding",
    "mask_from_padding",
    "farthest_point_sample",
    "query_ball_point",
    "knn",
    "index_points",
    "hungarian",
    "hungarian_cost",
]
