"""Full driver flow on the on-disk PaintNet layout (VERDICT r1 item 6).

The synthetic-data e2e tests (test_train_e2e / test_drivers_e2e) exercise
the drivers; this suite runs the same flow through ``DiskPaintDataset``
on a fabricated category in the reference's real on-disk layout
(OBJ meshes + ``*_trajectory.txt`` + split JSONs, reference
utils/disk.py:85-110 + utils/dataset/paintnet_ODv1.py:144-243):
train -> npz cache -> eval dumps -> render -> simulator export.
"""
import glob
import json
import os
import sys

import numpy as np
import pytest

from maskplanner_tpu.utils.args import load_args
from test_disk_data import write_obj, write_traj


@pytest.mark.slow
class TestDiskDriversE2E:
    @pytest.fixture(scope="class")
    def disk_run(self, tmp_path_factory):
        import train_maskplanner

        root = tmp_path_factory.mktemp("paintnet_root")
        cat = root / "minicubes-v1"
        names = [f"cube_{i:03d}" for i in range(4)]
        for i, name in enumerate(names):
            d = cat / name
            d.mkdir(parents=True)
            write_obj(d / f"{name}.obj", scale=1.0 + 0.1 * i)
            write_traj(d / f"{name}_trajectory.txt", seed=i)
        (cat / "train_split.json").write_text(json.dumps(names[:3]))
        (cat / "test_split.json").write_text(json.dumps(names[3:]))

        out = tmp_path_factory.mktemp("run")
        old = os.environ.get("PAINTNET_ROOT")
        os.environ["PAINTNET_ROOT"] = str(root)
        try:
            cfg = load_args(argv=[
                "config=[maskplanner,cuboids_v2,longx_v2,debug]",
                "dataset=minicubes-v1", "pc_points=64", "traj_points=120",
                "n_pred_traj_points=120", "batch_size=2", "epochs=2",
                "eval_freq=2", "no_save=false", "seed=3",
                "traj_with_equally_spaced_points=false",
                f"output_dir={out}"])
            run_dir, _ = train_maskplanner.main(cfg)
            yield str(root), run_dir
        finally:
            if old is None:
                os.environ.pop("PAINTNET_ROOT", None)
            else:
                os.environ["PAINTNET_ROOT"] = old

    def test_train_used_disk_source_and_cache(self, disk_run):
        root, run_dir = disk_run
        # training materialized the reference's npz preprocess cache
        # next to each mesh (paintnet_ODv1.py:196-243 contract)
        caches = glob.glob(os.path.join(
            root, "minicubes-v1", "*", "paintnet_preprocessed_sample", "*.npz"))
        assert caches, "no npz preprocess cache written by training"
        assert os.path.isdir(os.path.join(run_dir, "last_checkpoint"))
        logs = [json.loads(l) for l in
                open(os.path.join(run_dir, "logs.jsonl"))]
        losses = [l["train_loss"] for l in logs if "train_loss" in l]
        assert len(losses) == 2 and np.isfinite(losses).all()

    def test_eval_driver_on_disk_split(self, disk_run, monkeypatch):
        import test_maskplanner as eval_driver

        root, run_dir = disk_run
        monkeypatch.setattr(sys, "argv", [
            "test_maskplanner.py", "--run", run_dir, "--model", "last",
            "--save", "--split", "test"])
        eval_driver.main()
        dumps = glob.glob(os.path.join(run_dir, "results",
                                       "last_test_batch*.npy"))
        assert dumps, "eval driver wrote no .npy dumps"
        d = np.load(dumps[0], allow_pickle=True).item()
        assert np.isfinite(d["traj_pred"]).all()
        # the single test item is the held-out cube_003
        assert d["traj"].shape[0] == 1

    def test_render_driver_on_disk_data(self, disk_run, monkeypatch):
        import matplotlib
        matplotlib.use("Agg")
        import render_results

        root, run_dir = disk_run
        monkeypatch.setattr(sys, "argv", [
            "render_results.py", "--run", run_dir, "--model", "last",
            "--split", "test", "--max_samples", "1"])
        render_results.main()
        assert glob.glob(os.path.join(run_dir, "renders", "*.png"))

    def test_simulator_export_denormalizes_disk_scale(self, disk_run,
                                                      monkeypatch, tmp_path):
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "standalone"))
        import from_pred_to_offline_v2 as export_tool

        root, run_dir = disk_run
        out = tmp_path / "programs"
        monkeypatch.setattr(sys, "argv", [
            "from_pred_to_offline_v2.py", "--run", run_dir,
            "--output_dir", str(out), "--model", "last"])
        export_tool.main()
        gt_files = glob.glob(str(out / "gt_*" / "*.txt"))
        assert gt_files
        rows = np.genfromtxt(gt_files[0], delimiter=";", skip_header=1)
        assert rows.shape[1] == 7 and np.isfinite(rows).all()
        # GT roundtrips back to the fabricated workspace coordinates:
        # write_traj places poses in x 0.1..0.9, y 0.2/0.7, z 1.3
        assert 0.5 < np.abs(rows[:, :3]).max() < 3.0
