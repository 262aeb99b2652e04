"""Eval + render driver roundtrip: train tiny -> test_maskplanner -> render.

Covers the reference's full user flow (SURVEY.md §3.2/§3.3): checkpoint
selection, eval with .npy dumps, and the render driver consuming them
through the mask->id postprocess + matplotlib output.
"""
import os
import sys
import glob

import numpy as np
import pytest

from maskplanner_tpu.utils.args import load_args


@pytest.mark.slow
class TestEvalAndRenderDrivers:
    @pytest.fixture(scope="class")
    def run_dir(self, tmp_path_factory):
        import train_maskplanner

        tmp = tmp_path_factory.mktemp("run")
        cfg = load_args(argv=[
            "config=[maskplanner,cuboids_v2,longx_v2,debug]",
            "pc_points=64", "n_pred_traj_points=80", "batch_size=2",
            "epochs=2", "eval_freq=2", "dataset_size=2",
            "test_dataset_size=2", "no_save=false", "seed=2",
            f"output_dir={tmp}"])
        run_dir, _ = train_maskplanner.main(cfg)
        return run_dir

    def test_eval_driver(self, run_dir, monkeypatch):
        import test_maskplanner as eval_driver

        monkeypatch.setattr(sys, "argv", [
            "test_maskplanner.py", "--run", run_dir, "--model", "last",
            "--save", "--split", "test"])
        eval_driver.main()
        dumps = glob.glob(os.path.join(run_dir, "results",
                                       "last_test_batch*.npy"))
        assert dumps, "eval driver wrote no .npy dumps"
        d = np.load(dumps[0], allow_pickle=True).item()
        for key in ("traj", "traj_pred", "pred_stroke_masks",
                    "stroke_masks_scores", "stroke_ids", "point_cloud"):
            assert key in d and d[key] is not None
        assert np.isfinite(d["traj_pred"]).all()

    def test_render_driver(self, run_dir, monkeypatch):
        import matplotlib
        matplotlib.use("Agg")
        import render_results

        monkeypatch.setattr(sys, "argv", [
            "render_results.py", "--run", run_dir, "--model", "last",
            "--split", "test", "--max_samples", "1"])
        render_results.main()
        pngs = glob.glob(os.path.join(run_dir, "renders", "*.png"))
        assert pngs, "render driver wrote no images"

    def test_render_with_postprocess(self, run_dir, monkeypatch):
        import matplotlib
        matplotlib.use("Agg")
        import render_results

        monkeypatch.setattr(sys, "argv", [
            "render_results.py", "--run", run_dir, "--model", "last",
            "--split", "test", "--with_postprocess", "--align_stroke_ids",
            "--max_samples", "1"])
        render_results.main()
        pngs = glob.glob(os.path.join(run_dir, "renders", "*.png"))
        assert pngs
