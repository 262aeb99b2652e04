"""Write a fabricated PaintNet category to disk (real dataset layout).

The proprietary PaintNet data ships as ``$PAINTNET_ROOT/<category>/
<item>/{<item>.obj, <item>_trajectory.txt}`` plus ``{train,test}_split
.json`` (reference ``utils/disk.py:85-110,184-220``). This generator
materializes the synthetic box-raster objects of
:mod:`maskplanner_tpu.data.synthetic` in exactly that on-disk layout —
triangulated OBJ meshes, ``;``-separated Euler-angle trajectory programs
in workspace (mm-like) scale — so the full disk pipeline (mesh sampling,
npz preprocessing cache, per-dataset normalization, export, spray
simulation, coverage) can be exercised end to end without the real data.
"""
from __future__ import annotations

import json
import os

import numpy as np

from .io import orientnorm_to_euler, save_traj_file
from .synthetic import CATEGORY_PRESETS, _raster_stroke

# 12-triangle box with outward-oriented faces
_BOX_FACES = np.array([
    [0, 1, 3], [0, 3, 2],      # -x
    [4, 6, 7], [4, 7, 5],      # +x
    [0, 4, 5], [0, 5, 1],      # -y
    [2, 3, 7], [2, 7, 6],      # +y
    [0, 2, 6], [0, 6, 4],      # -z
    [1, 5, 7], [1, 7, 3],      # +z
], np.int64)


def box_mesh(dims: np.ndarray):
    """Axis-aligned box centred at the origin -> (verts (8,3), tris)."""
    half = np.asarray(dims, np.float64) / 2.0
    verts = np.array([[sx * half[0], sy * half[1], sz * half[2]]
                      for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
    return verts, _BOX_FACES.copy()


def write_obj(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for a, b, c in faces:
            f.write(f"f {a + 1} {b + 1} {c + 1}\n")


def generate_item(category: str, index: int, seed: int = 0,
                  workspace_scale: float = 800.0):
    """One fabricated object: (verts, faces, traj (T,6), stroke_ids).

    ``traj`` carries [x, y, z, nx, ny, nz] with the orientation normal =
    spray axis (inward face normal), all in workspace scale.
    """
    import zlib

    preset = CATEGORY_PRESETS.get(category, CATEGORY_PRESETS["cuboids-v2"])
    cat_seed = zlib.crc32(category.encode())
    rng = np.random.default_rng(
        np.random.SeedSequence([cat_seed, index, seed, 7]))
    dims = rng.uniform(*preset["size"], size=3)
    standoff = 0.3 * dims.mean()

    n_faces = int(rng.integers(*preset["n_faces"]) if
                  preset["n_faces"][0] < preset["n_faces"][1]
                  else preset["n_faces"][0])
    faces_painted = rng.choice(6, size=min(max(n_faces, 1), 6),
                               replace=False)
    trajs, ids = [], []
    for sid, f in enumerate(faces_painted):
        t = _raster_stroke(rng, dims, int(f),
                           n_lines=int(rng.integers(3, 6)),
                           pts_per_line=int(rng.integers(10, 18)),
                           standoff=standoff)
        trajs.append(t)
        ids.append(np.full(t.shape[0], sid, np.int64))
    traj = np.concatenate(trajs, axis=0)
    traj[:, :3] *= workspace_scale
    verts, tris = box_mesh(dims * workspace_scale)
    return verts, tris, traj, np.concatenate(ids)


def write_category(root: str, category: str, n_train: int = 6,
                   n_test: int = 2, seed: int = 0,
                   workspace_scale: float = 800.0) -> str:
    """Materialize the category under ``root``; returns its directory."""
    cat_dir = os.path.join(root, category)
    names = [f"box_{i:03d}" for i in range(n_train + n_test)]
    for i, name in enumerate(names):
        d = os.path.join(cat_dir, name)
        os.makedirs(d, exist_ok=True)
        verts, tris, traj, ids = generate_item(
            category, i, seed, workspace_scale)
        write_obj(os.path.join(d, f"{name}.obj"), verts, tris)
        euler = orientnorm_to_euler(traj[:, 3:6])
        rows = np.concatenate(
            [traj[:, :3], euler, ids[:, None].astype(np.float64)], axis=1)
        save_traj_file(rows, os.path.join(d, f"{name}_trajectory.txt"),
                       kind="euler")
        # the real dataset names the program plainly ``trajectory.txt``
        # (reference paintnet_ODv1.py:154); write that name too so the
        # reference loader can consume the fixture directly
        import shutil
        shutil.copyfile(os.path.join(d, f"{name}_trajectory.txt"),
                        os.path.join(d, "trajectory.txt"))
    with open(os.path.join(cat_dir, "train_split.json"), "w") as f:
        json.dump(names[:n_train], f)
    with open(os.path.join(cat_dir, "test_split.json"), "w") as f:
        json.dump(names[n_train:], f)
    return cat_dir
