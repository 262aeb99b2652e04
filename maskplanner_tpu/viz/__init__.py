"""Visualization (matplotlib-based).

Reference: ``utils/visualize.py`` (pyvista renderers). This environment has
no pyvista/OpenGL; the renderers here produce equivalent artifacts
(per-stroke colored trajectories over the object point cloud, GT/pred
side-by-side comparisons, batch grids, orientation quivers) with
matplotlib 3D — headless-safe PNG output.
"""
from .render import (
    stroke_colors,
    visualize_traj,
    visualize_mesh_traj,
    visualize_sample_pred_gt,
    visualize_batch_grid,
)

__all__ = [
    "stroke_colors",
    "visualize_traj",
    "visualize_mesh_traj",
    "visualize_sample_pred_gt",
    "visualize_batch_grid",
]
