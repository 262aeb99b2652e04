"""Disk-pipeline parity vs the reference's own ``PaintNetODv1Dataloader``.

The real-data path is the least CPU-provable part of the stack (mesh
Poisson sampling is native in the reference), but everything downstream
of the preprocessed-sample cache is pure numpy in the reference
(``paintnet_ODv1.py:241-484``): traj subsampling, λ-segmentation +
padding, stroke-mask construction. This test materializes a fabricated
category in the real on-disk layout, pre-populates the *reference's* npz
cache with this repo's preprocessed arrays (centred on the mesh vertex
centroid + per-dataset scaled + seeded pc subsample — the same stage the
reference caches at), then runs the reference ``__getitem__`` against
this repo's ``PaintDataset`` item and asserts equality.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from ref_harness import import_reference  # noqa: E402

ref = import_reference()

from maskplanner_tpu.data.dataset import (  # noqa: E402
    PAD_STROKE_ID,
    PAD_VALUE,
    PaintDataset,
)
from maskplanner_tpu.data.fixture_category import write_category  # noqa: E402
from maskplanner_tpu.utils.args import load_args  # noqa: E402

DictConfig = sys.modules["omegaconf"].DictConfig

CATEGORY = "cuboids-v2"
PC_POINTS = 512
TRAJ_POINTS = 256
LAMBDA, OVERLAP = 4, 1
WEIGHT_ORIENT = 0.25
SCALE = 800.0


@pytest.fixture(scope="module")
def disk_pair(tmp_path_factory):
    """(our PaintDataset, reference dataloader with pre-populated cache)."""
    tmp = tmp_path_factory.mktemp("refdisk")
    root = tmp / "paintnet"
    cat_dir = write_category(str(root), CATEGORY, n_train=3, n_test=1,
                             seed=11)
    os.environ["PAINTNET_ROOT"] = str(root)
    try:
        cfg = load_args(argv=[
            "config=[maskplanner,cuboids_v2,longx_v2]",
            f"dataset={CATEGORY}", f"pc_points={PC_POINTS}",
            f"traj_points={TRAJ_POINTS}", "n_pred_traj_points=256",
            "max_n_strokes=8", "traj_with_equally_spaced_points=false",
            f"data_scale_factor={SCALE}", f"weight_orient={WEIGHT_ORIENT}",
            "cache_size=0",
        ])
        ours = PaintDataset(cfg, split="train")
    finally:
        os.environ.pop("PAINTNET_ROOT", None)

    ref_cfg = DictConfig({
        "load_extra_data": ["stroke_masks"],
        "traj_with_equally_spaced_points": False,
        "equal_in_3d_space": False,
        "equal_spaced_points_distance": 0.05,
    })
    ref_ds = ref.paintnet_ODv1.PaintNetODv1Dataloader(
        roots=[str(cat_dir)], dataset=CATEGORY, pc_points=PC_POINTS,
        traj_points=TRAJ_POINTS, lambda_points=LAMBDA,
        overlapping=OVERLAP, split="train",
        extra_data=("orientnorm",), weight_orient=WEIGHT_ORIENT,
        normalization="per-dataset", data_scale_factor=SCALE,
        cache_size=0, config=ref_cfg)

    # pre-populate the reference's preprocessed cache with this repo's
    # preprocessed arrays (the cache stage: centred, scaled, pc already
    # subsampled; reference paintnet_ODv1.py:241-243)
    src = ours.sources[0]
    fname = ref_ds._get_preprocessed_sample_name()
    for i, (mesh_file, _traj_file, _d) in enumerate(ref_ds.datapath):
        pc_raw, traj_raw, ids_raw = src.raw_item(i)
        centroid = np.asarray(src.centroid(i), pc_raw.dtype)
        pc = (pc_raw - centroid) / SCALE
        traj = traj_raw.copy()
        traj[:, :3] = (traj[:, :3] - centroid) / SCALE
        rng = np.random.default_rng(i)
        choice = rng.choice(pc.shape[0], PC_POINTS, replace=False)
        cache_dir = os.path.join(os.path.dirname(mesh_file),
                                 "paintnet_preprocessed_sample")
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(os.path.join(cache_dir, fname), point_cloud=pc[choice],
                 traj=traj, stroke_ids=ids_raw)
    return ours, ref_ds


def _unpad_ref(traj, ids):
    valid = ids >= 0
    return traj[valid], ids[valid]


@pytest.mark.parametrize("index", [0, 1, 2])
def test_disk_item_parity(disk_pair, index):
    ours, ref_ds = disk_pair
    mine = ours[index]
    theirs = ref_ds[index]

    np.testing.assert_allclose(mine["point_cloud"],
                               np.asarray(theirs["point_cloud"]),
                               rtol=1e-6, atol=1e-7)

    ref_traj, ref_ids = _unpad_ref(np.asarray(theirs["traj"]),
                                   np.asarray(theirs["stroke_ids"]))
    my_valid = mine["stroke_ids"] != PAD_STROKE_ID
    np.testing.assert_allclose(mine["traj"][my_valid], ref_traj,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(mine["stroke_ids"][my_valid], ref_ids)
    # padded rows carry the sentinel
    assert np.all(mine["traj"][~my_valid] == PAD_VALUE)

    ref_pc = np.asarray(theirs["traj_as_pc"])
    my_pc_valid = mine["stroke_ids_as_pc"] != PAD_STROKE_ID
    np.testing.assert_allclose(mine["traj_as_pc"][my_pc_valid], ref_pc,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        mine["stroke_ids_as_pc"][my_pc_valid],
        np.asarray(theirs["stroke_ids_as_pc"]))

    n = int(theirs["n_strokes"])
    assert int(mine["n_strokes"]) == n

    # stroke masks: reference (n_strokes, S_dyn) over padded segment ids;
    # ours (max_n_strokes, S_budget)
    ref_masks = np.asarray(theirs["stroke_masks"], np.float32)
    S_dyn = ref_masks.shape[1]
    np.testing.assert_array_equal(mine["stroke_masks"][:n, :S_dyn],
                                  ref_masks)
    assert np.all(mine["stroke_masks"][n:] == 0)
    assert np.all(mine["stroke_masks"][:, S_dyn:] == 0)
