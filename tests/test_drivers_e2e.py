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


class TestCoverageMetric:
    def test_coverage_math(self, tmp_path, monkeypatch):
        """compute_paint_coverage_per_face: identical thickness -> 100%,
        empty prediction -> 0% (reference percentile-threshold math)."""
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "standalone"))
        import compute_paint_coverage_per_face as cov_tool

        rng = np.random.default_rng(0)
        gt_dir = tmp_path / "gt"
        good = tmp_path / "good"
        bad = tmp_path / "bad"
        for d in (gt_dir, good, bad):
            d.mkdir()
        n_faces = 50
        thick = np.repeat(rng.uniform(1, 30, n_faces), 3)  # 3 verts/face
        thick[:9] = 0.0  # some unpainted faces
        for name in ("obj_a.txt", "obj_b.txt"):
            np.savetxt(gt_dir / name, thick, delimiter=";")
            np.savetxt(good / name, thick, delimiter=";")
            np.savetxt(bad / name, np.zeros_like(thick), delimiter=";")

        monkeypatch.setattr(sys, "argv", [
            "compute_paint_coverage_per_face.py", "--gt-run", str(gt_dir),
            "--runs", str(good), str(bad), "--percentile", "10"])
        coverages = cov_tool.main()
        assert np.allclose(coverages[0], 1.0)
        assert np.allclose(coverages[1], 0.0)


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

    def test_simulator_export(self, run_dir, monkeypatch, tmp_path):
        """from_pred_to_offline_v2: .npy dumps -> denormalized ;-separated
        robot programs with Euler angles + strokeId column."""
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "standalone"))
        import from_pred_to_offline_v2 as export_tool

        out = tmp_path / "programs"
        monkeypatch.setattr(sys, "argv", [
            "from_pred_to_offline_v2.py", "--run", run_dir,
            "--output_dir", str(out), "--model", "last"])
        export_tool.main()
        pred_files = glob.glob(str(out / "pred_*" / "*.txt"))
        gt_files = glob.glob(str(out / "gt_*" / "*.txt"))
        assert pred_files and gt_files
        header = open(pred_files[0]).readline().strip().split(";")
        assert header == ["X", "Y", "Z", "A", "B", "C", "strokeId"]
        rows = np.genfromtxt(pred_files[0], delimiter=";", skip_header=1)
        assert rows.shape[1] == 7 and np.isfinite(rows).all()
        # denormalized back to workspace scale (cuboids-v2 factor ~890)
        assert np.abs(rows[:, :3]).max() > 10.0

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

    def test_eval_driver_cross_category_transfer(self, run_dir, monkeypatch):
        """--target overrides the eval category with scale handling
        (reference test_maskplanner.py:70-83). A few-stroke target keeps
        the fixture's tiny traj budget feasible (many-stroke categories
        would leave every stroke shorter than lambda after resampling —
        data infeasibility, same as the reference on real data)."""
        import test_maskplanner as eval_driver

        monkeypatch.setattr(sys, "argv", [
            "test_maskplanner.py", "--run", run_dir, "--model", "last",
            "--split", "test", "--target", "cuboids-v2",
            "--renormalize_data_to_default"])
        eval_driver.main()

    def test_pretrained_custom_initializes_encoder(self, run_dir, tmp_path):
        """model.pretrained_custom warm-starts from another run's last
        checkpoint with the output heads filtered (reference
        init_from_pretrained_custom, models/__init__.py:386-426)."""
        import jax
        import train_maskplanner
        from maskplanner_tpu.utils.config import load_config
        from maskplanner_tpu.models import get_model
        from maskplanner_tpu.train import checkpoints
        from maskplanner_tpu.train.trainer import create_train_state

        cfg = load_args(argv=[
            "config=[maskplanner,cuboids_v2,longx_v2,debug]",
            "pc_points=64", "n_pred_traj_points=80", "batch_size=2",
            "epochs=1", "eval_freq=1", "dataset_size=2",
            "test_dataset_size=2", "no_save=true", "seed=3",
            f"model.pretrained_custom={run_dir}",
            f"output_dir={tmp_path}"])
        run2, state2 = train_maskplanner.main(cfg)

        # donor encoder params (post-train of run 1)
        cfg1 = load_config(run_dir)
        model1 = get_model(cfg1)
        fresh = create_train_state(model1, cfg1, jax.random.PRNGKey(0),
                                   np.zeros((1, 64, 3), np.float32))
        donor, _ = checkpoints.load_checkpoint(run_dir, "last_checkpoint",
                                               fresh)
        d_enc = jax.tree.leaves(donor.params["encoder"])
        # run-2 encoder started from donor then trained 1 epoch on 1 batch:
        # shapes identical; at least the BN running stats trees must match
        # structurally and the head tree must exist independently
        s_enc = jax.tree.leaves(state2.params["encoder"])
        assert len(d_enc) == len(s_enc)
        assert all(a.shape == b.shape for a, b in zip(d_enc, s_enc))


@pytest.mark.slow
class TestPreemption:
    def test_sigterm_checkpoints_and_resume_completes(self, tmp_path):
        """Graceful preemption (PARITY §5): SIGTERM mid-training must
        write a resumable checkpoint and exit cleanly; a second run with
        resume=true finishes the remaining epochs from where it stopped."""
        import json
        import signal
        import subprocess
        import time

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        argv = ["config=[maskplanner,cuboids_v2,longx_v2,debug]",
                "pc_points=64", "n_pred_traj_points=80", "batch_size=2",
                "epochs=500", "eval_freq=1", "dataset_size=2",
                "test_dataset_size=2", "no_save=false", "seed=1",
                "device_dataset=false",  # exercise the host-loader loop
                f"output_dir={tmp_path}"]
        # sanitized env like conftest.run_in_clean_subprocess: the
        # container's sitecustomize registers the TPU platform at
        # interpreter start, before JAX_PLATFORMS is read
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env["PYTHONPATH"] = ":".join(
            [repo] + [p for p in env.get("PYTHONPATH", "").split(":")
                      if p and "axon_site" not in p])
        proc = subprocess.Popen(
            [sys.executable, os.path.join(repo, "train_maskplanner.py")]
            + argv, env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

        # wait until a few epochs have been logged, then preempt
        def logged_epochs():
            logs = glob.glob(os.path.join(tmp_path, "*", "logs.jsonl"))
            if not logs:
                return 0
            return sum(1 for l in open(logs[0]) if "train_loss" in l)

        deadline = time.time() + 400
        while logged_epochs() < 3 and time.time() < deadline:
            assert proc.poll() is None, proc.stdout.read().decode()[-2000:]
            time.sleep(2)
        assert logged_epochs() >= 3, "training never reached epoch 3"
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=300)

        run_dir = glob.glob(os.path.join(tmp_path, "*"))[0]
        assert os.path.isdir(os.path.join(run_dir, "last_checkpoint"))
        n_before = sum(1 for l in open(os.path.join(run_dir, "logs.jsonl"))
                       if "train_loss" in l)
        assert 3 <= n_before < 500, n_before

        # resume to completion with a short remaining budget
        import train_maskplanner

        # resume=<run_dir> targets the preempted run directly (the real
        # user flow; a bare resume=true would land in a fresh
        # timestamped run dir)
        cfg = load_args(argv=argv[:-1] + [f"output_dir={tmp_path}",
                                          f"resume={run_dir}"])
        cfg["epochs"] = n_before + 2
        run_dir2, state = train_maskplanner.main(cfg)
        assert run_dir2 == run_dir
        logs = [json.loads(l) for l in
                open(os.path.join(run_dir, "logs.jsonl"))]
        epochs_logged = [l["epoch"] for l in logs if "train_loss" in l]
        assert max(epochs_logged) == n_before + 2
        assert int(state.step) > 0
