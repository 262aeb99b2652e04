"""Matplotlib 3D renderers for trajectories and predictions.

Reference behaviors: ``utils/visualize.py:589-910`` (visualize_mesh_traj —
mesh/pc + per-stroke colored segments + orientation arrows) and
``render_results.py:249-350`` (side-by-side GT/pred views, batch grids).
"""
from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def stroke_colors(n: int):
    """Distinct per-stroke colors (reference utils/visualize.py:1170-1203)."""
    cmap = plt.get_cmap("tab20")
    return [cmap(i % 20) for i in range(max(n, 1))]


def _axis_equal(ax, pts):
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    center, radius = (lo + hi) / 2, (hi - lo).max() / 2 + 1e-6
    ax.set_xlim(center[0] - radius, center[0] + radius)
    ax.set_ylim(center[1] - radius, center[1] + radius)
    ax.set_zlim(center[2] - radius, center[2] + radius)


def visualize_traj(ax, traj, stroke_ids=None, with_orientations=False,
                   point_size=2.0):
    """Scatter/plot per-stroke colored trajectory points on a 3D axis."""
    traj = np.asarray(traj)
    valid = ~np.all(traj[:, :3] == -100.0, axis=-1)
    traj = traj[valid]
    if stroke_ids is None:
        stroke_ids = np.zeros(traj.shape[0])
    else:
        stroke_ids = np.asarray(stroke_ids).reshape(-1)[valid]
    colors = stroke_colors(int(stroke_ids.max()) + 1 if len(stroke_ids) else 1)
    for sid in np.unique(stroke_ids):
        if sid < 0:
            continue
        pts = traj[stroke_ids == sid]
        ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], ".-", ms=point_size,
                lw=0.6, color=colors[int(sid) % len(colors)])
        if with_orientations and traj.shape[-1] >= 6:
            step = max(1, len(pts) // 25)
            q = pts[::step]
            ax.quiver(q[:, 0], q[:, 1], q[:, 2], q[:, 3], q[:, 4], q[:, 5],
                      length=0.08, color="gray", lw=0.4)
    if len(traj):
        _axis_equal(ax, traj[:, :3])


def visualize_mesh_traj(point_cloud, traj, stroke_ids=None, save_path=None,
                        title=None, with_orientations=False, elev=25,
                        azim=45):
    """Object point cloud + per-stroke colored trajectory -> PNG."""
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    pc = np.asarray(point_cloud)
    ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], s=0.3, c="lightgray", alpha=0.5)
    visualize_traj(ax, traj, stroke_ids, with_orientations)
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    if title:
        ax.set_title(title, fontsize=9)
    if save_path:
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return save_path
    return fig


def visualize_sample_pred_gt(point_cloud, traj_gt, ids_gt, traj_pred,
                             ids_pred, save_path, title=""):
    """Side-by-side GT | prediction views from multiple cameras
    (reference render_results.py:249-313 uses a 2×4 camera grid)."""
    cams = [(25, 45), (25, 225)]
    fig = plt.figure(figsize=(4 * len(cams), 8))
    pc = np.asarray(point_cloud)
    for col, (elev, azim) in enumerate(cams):
        for row, (traj, ids, label) in enumerate(
                [(traj_gt, ids_gt, "GT"), (traj_pred, ids_pred, "pred")]):
            ax = fig.add_subplot(2, len(cams), row * len(cams) + col + 1,
                                 projection="3d")
            ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], s=0.3, c="lightgray",
                       alpha=0.5)
            visualize_traj(ax, traj, ids)
            ax.view_init(elev=elev, azim=azim)
            ax.set_axis_off()
            if col == 0:
                ax.set_title(f"{label} {title}", fontsize=8)
    fig.tight_layout()
    fig.savefig(save_path, dpi=130, bbox_inches="tight")
    plt.close(fig)
    return save_path


def visualize_batch_grid(point_clouds, trajs, ids_list, save_path,
                         max_items=8, title=""):
    """Grid of per-sample renders (reference render_results.py:321-350)."""
    n = min(len(trajs), max_items)
    cols = min(4, n)
    rows = -(-n // cols)
    fig = plt.figure(figsize=(3 * cols, 3 * rows))
    for i in range(n):
        ax = fig.add_subplot(rows, cols, i + 1, projection="3d")
        pc = np.asarray(point_clouds[i])
        ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], s=0.2, c="lightgray",
                   alpha=0.4)
        visualize_traj(ax, trajs[i], ids_list[i])
        ax.view_init(elev=25, azim=45)
        ax.set_axis_off()
    if title:
        fig.suptitle(title, fontsize=10)
    fig.tight_layout()
    fig.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return save_path
