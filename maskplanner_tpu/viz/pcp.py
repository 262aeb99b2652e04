"""Parallel-coordinates plot for hyperparameter sweeps.

Reference: ``utils/pcp.py`` (vendored plotting utility used to inspect
sweep results). Matplotlib implementation: each run is a polyline across
vertically-normalized axes, colored by an objective column.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def parallel_coordinates_plot(
    data: Sequence[dict],
    columns: Sequence[str],
    color_by: str | None = None,
    save_path: str | None = None,
    cmap: str = "viridis",
    title: str = "",
):
    """data: list of dicts (one per run) with numeric values per column."""
    cols = list(columns)
    mat = np.array([[float(d[c]) for c in cols] for d in data])
    lo, hi = mat.min(axis=0), mat.max(axis=0)
    span = np.where(hi - lo == 0, 1.0, hi - lo)
    norm = (mat - lo) / span

    fig, ax = plt.subplots(figsize=(1.6 * len(cols) + 2, 5))
    if color_by is not None:
        cvals = np.array([float(d[color_by]) for d in data])
        crange = cvals.max() - cvals.min() or 1.0
        colors = plt.get_cmap(cmap)((cvals - cvals.min()) / crange)
    else:
        colors = ["steelblue"] * len(data)

    xs = np.arange(len(cols))
    for row, color in zip(norm, colors):
        ax.plot(xs, row, color=color, alpha=0.6, lw=1.2)
    for x in xs:
        ax.axvline(x, color="gray", lw=0.6)
        ax.text(x, -0.06, f"{lo[x]:.3g}", ha="center", va="top", fontsize=7,
                transform=ax.get_xaxis_transform())
        ax.text(x, 1.02, f"{hi[x]:.3g}", ha="center", va="bottom", fontsize=7,
                transform=ax.get_xaxis_transform())
    ax.set_xticks(xs)
    ax.set_xticklabels(cols, fontsize=9)
    ax.set_yticks([])
    ax.set_title(title)
    for side in ("top", "right", "left"):
        ax.spines[side].set_visible(False)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=140)
        plt.close(fig)
        return save_path
    return fig
