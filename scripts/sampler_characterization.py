"""Characterize the mesh surface sampler against the Poisson-disk contract.

The reference preprocesses every mesh with pcu.sample_mesh_poisson_disk
(~10k blue-noise points, utils/disk.py:274-288). This repo replaces that
C++ dependency with area-weighted barycentric oversampling + grid-hash
dart throwing (maskplanner_tpu/data/io.py:sample_mesh_surface). This
script measures whether the replacement honours the contract that matters
downstream:

  1. blue-noise spacing — pairwise min distance >= dart radius
     r = sqrt(A / 2n); NN-distance histogram stats vs a uniform
     area-weighted sampler (the no-thinning baseline).
  2. coverage uniformity — per-face sample counts proportional to face
     areas (chi-square-style normalized deviation).
  3. count contract — points returned vs requested.
  4. cold-cache preprocessing throughput (meshes/sec at 10k points).

Run: python scripts/sampler_characterization.py
Prints a markdown table (pasted into docs/sampler.md).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maskplanner_tpu.data.io import sample_mesh_surface
from maskplanner_tpu.data.fixture_category import box_mesh


def icosphere(subdiv: int = 3, radius: float = 1.0):
    """Icosahedron subdivided ``subdiv`` times — curved, uniform tris."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int64)
    for _ in range(subdiv):
        mid: dict[tuple, int] = {}
        verts = list(v)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                m = verts[a] + verts[b]
                m /= np.linalg.norm(m)
                mid[key] = len(verts)
                verts.append(m)
            return mid[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v = np.asarray(verts)
        f = np.asarray(nf, np.int64)
    return v * radius, f


def skewed_box(scale=800.0):
    """Box with wildly unequal face areas — stresses area weighting."""
    v, f = box_mesh(np.array([4.0, 1.0, 0.05]) * scale / 4.0)
    return v, f


def nn_stats(pts: np.ndarray):
    from scipy.spatial import cKDTree

    d, _ = cKDTree(pts).query(pts, k=2)
    return d[:, 1]  # NN distance per point


def face_area_uniformity(owner, n_pts, v, f):
    """Normalized per-face count deviation: sum over faces of
    (count - expected)^2 / expected, divided by n_faces (≈1 for a
    perfectly area-proportional sampler with Poisson counting noise).
    ``owner`` = exact source triangle per sample."""
    tri = v[f]
    areas = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    counts = np.bincount(owner, minlength=len(f)).astype(np.float64)
    exp = areas / areas.sum() * n_pts
    valid = exp > 5
    chi2 = ((counts[valid] - exp[valid]) ** 2 / exp[valid]).sum()
    return chi2 / valid.sum()


def characterize(name, v, f, n_points=10000, seed=0):
    tri = v[f]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1).sum()
    r = np.sqrt(area / (2.0 * n_points))

    t0 = time.perf_counter()
    pd, owner = sample_mesh_surface(v, f, n_points, seed=seed, poisson=True,
                                    return_face_idx=True)
    dt = time.perf_counter() - t0
    un = sample_mesh_surface(v, f, n_points, seed=seed, poisson=False)

    dn_pd, dn_un = nn_stats(pd), nn_stats(un)
    row = {
        "mesh": name,
        "count": f"{len(pd)}/{n_points}",
        "min_nn/r": round(float(dn_pd.min() / r), 3),
        "mean_nn/r": round(float(dn_pd.mean() / r), 3),
        "cv_nn": round(float(dn_pd.std() / dn_pd.mean()), 3),
        "cv_nn_uniform": round(float(dn_un.std() / dn_un.mean()), 3),
        "min_nn/r_uniform": round(float(dn_un.min() / r), 4),
        "face_chi2": round(face_area_uniformity(owner, len(pd), v, f), 2),
        "sec": round(dt, 3),
    }
    return row


def main():
    rows = []
    v, f = box_mesh(np.array([800.0, 600.0, 400.0]))
    rows.append(characterize("box 0.8x0.6x0.4m", v, f))
    rows.append(characterize("skewed box 80:1 faces", *skewed_box()))
    rows.append(characterize("icosphere(3)", *icosphere(3, 500.0)))

    keys = list(rows[0])
    print("| " + " | ".join(keys) + " |")
    print("|" + "---|" * len(keys))
    for row in rows:
        print("| " + " | ".join(str(row[k]) for k in keys) + " |")
    print(f"\nthroughput: "
          f"{len(rows) / sum(r['sec'] for r in rows):.2f} meshes/sec "
          f"(cold, 10k pts, 1 CPU core)")


if __name__ == "__main__":
    main()
