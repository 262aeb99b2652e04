"""Serving layer: one-shot mesh->program inference + AOT export
(maskplanner_tpu/serve.py, predict_maskplanner.py).

Uses a fabricated on-disk PaintNet category (same layout as
test_disk_data) and a run dir built from a freshly initialized model —
serving correctness is independent of training quality."""
import json
import os
import sys

import numpy as np
import pytest

from maskplanner_tpu.utils.args import load_args
from maskplanner_tpu.utils.config import save_config
from test_disk_data import write_obj, write_traj


@pytest.fixture(scope="module")
def serve_run(tmp_path_factory):
    from maskplanner_tpu.models import get_model
    from maskplanner_tpu.train import checkpoints, create_train_state
    from maskplanner_tpu.utils import set_seed

    root = tmp_path_factory.mktemp("paintnet_root")
    cat = root / "minicubes-v1"
    names = [f"cube_{i:03d}" for i in range(3)]
    for i, name in enumerate(names):
        d = cat / name
        d.mkdir(parents=True)
        write_obj(d / f"{name}.obj", scale=1.0 + 0.1 * i)
        write_traj(d / f"{name}_trajectory.txt", seed=i)
    (cat / "train_split.json").write_text(json.dumps(names[:2]))
    (cat / "test_split.json").write_text(json.dumps(names[2:]))

    run_dir = tmp_path_factory.mktemp("run") / "serve_run"
    run_dir.mkdir()
    old = os.environ.get("PAINTNET_ROOT")
    os.environ["PAINTNET_ROOT"] = str(root)
    try:
        cfg = load_args(argv=[
            "config=[maskplanner,cuboids_v2,longx_v2,debug]",
            "dataset=minicubes-v1", "pc_points=64", "traj_points=120",
            "n_pred_traj_points=120", "batch_size=2", "seed=5",
            "traj_with_equally_spaced_points=false"])
        rng = set_seed(5)
        model = get_model(cfg)
        state = create_train_state(
            model, cfg, rng, np.zeros((1, 64, 3), np.float32))
        save_config(cfg, str(run_dir))
        checkpoints.save_checkpoint(str(run_dir), "last_checkpoint",
                                    state, 1, 0.0)
        mesh = str(cat / names[2] / f"{names[2]}.obj")
        yield str(run_dir), mesh
    finally:
        if old is None:
            os.environ.pop("PAINTNET_ROOT", None)
        else:
            os.environ["PAINTNET_ROOT"] = old


class TestPredictor:
    def test_predict_program_full_pipeline(self, serve_run):
        from maskplanner_tpu.serve import Predictor

        run_dir, mesh = serve_run
        pred = Predictor(run_dir, model="last")
        rows = pred.predict_program(mesh)
        assert rows.ndim == 2 and rows.shape[1] == 7
        assert np.isfinite(rows).all()
        # stroke ids are contiguous small ints
        ids = np.unique(rows[:, 6])
        assert np.allclose(ids, np.round(ids))
        # centroid restored: poses land in the mesh's workspace region
        # (write_obj boxes sit around the origin at scale ~1, traj z=1.3
        # before normalization; an origin-centered export would too, but
        # a mis-scaled one would not)
        assert np.abs(rows[:, :3]).max() < 10.0

    def test_raw_segments_mode(self, serve_run):
        from maskplanner_tpu.serve import Predictor

        run_dir, mesh = serve_run
        pred = Predictor(run_dir, model="last")
        rows = pred.predict_program(mesh, postprocess=False)
        # raw mode: every surviving segment contributes λ poses
        lam = int(pred.config["lambda_points"])
        assert rows.shape[0] % lam == 0 and rows.shape[1] == 7

    def test_program_roundtrips_through_reader(self, serve_run, tmp_path):
        from maskplanner_tpu.data.io import read_traj_file
        from maskplanner_tpu.serve import Predictor

        run_dir, mesh = serve_run
        pred = Predictor(run_dir, model="last")
        out = str(tmp_path / "prog" / "cube.txt")
        pred.save_program(mesh, out)
        traj, ids = read_traj_file(out, ["orientnorm"],
                                   pred.config["weight_orient"])
        assert traj.shape[1] == 6 and ids.ndim == 1
        assert np.isfinite(traj).all()

    def test_export_matches_live_forward(self, serve_run, tmp_path):
        from maskplanner_tpu.serve import Predictor, load_exported

        run_dir, mesh = serve_run
        pred = Predictor(run_dir, model="last")
        path = str(tmp_path / "forward.hlo")
        blob = pred.export_compiled(path)
        assert os.path.getsize(path) == len(blob) > 0

        fn = load_exported(path)
        pc, _ = pred.preprocess(mesh)
        live = pred.forward(pc[None])
        aot = fn(pc[None])
        # the AOT artifact is a second, independently optimized compile —
        # fusion differences shift ulps, not semantics
        np.testing.assert_allclose(np.asarray(aot[0]),
                                   np.asarray(live.traj), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(aot[1]),
                                   np.asarray(live.stroke_masks),
                                   rtol=1e-4, atol=1e-5)

    def test_corrupted_artifact_fails_loudly(self, serve_run, tmp_path):
        """A truncated/corrupted serialized artifact must raise at load or
        first call — never return a silently wrong program."""
        from maskplanner_tpu.serve import Predictor, load_exported

        run_dir, mesh = serve_run
        pred = Predictor(run_dir, model="last")
        path = str(tmp_path / "forward.hlo")
        blob = pred.export_compiled(path)

        truncated = str(tmp_path / "truncated.hlo")
        with open(truncated, "wb") as fh:
            fh.write(blob[: len(blob) // 2])
        flipped = str(tmp_path / "flipped.hlo")
        bad = bytearray(blob)
        for i in range(64, min(2048, len(bad)), 97):
            bad[i] ^= 0xFF
        with open(flipped, "wb") as fh:
            fh.write(bytes(bad))
        empty = str(tmp_path / "empty.hlo")
        open(empty, "wb").close()

        pc, _ = pred.preprocess(mesh)
        for broken in (truncated, flipped, empty):
            with pytest.raises(Exception):
                fn = load_exported(broken)
                fn(pc[None])  # some corruptions only surface at call time

        # and the pristine artifact still loads (the fixture isn't flaky)
        good = load_exported(path)
        assert np.isfinite(np.asarray(good(pc[None])[0])).all()

    def test_cli_end_to_end(self, serve_run, tmp_path, monkeypatch, capsys):
        import predict_maskplanner

        run_dir, mesh = serve_run
        out = tmp_path / "programs"
        artifact = str(tmp_path / "m.hlo")
        monkeypatch.setattr(sys, "argv", [
            "predict_maskplanner.py", "--run", run_dir, "--model", "last",
            "--meshes", mesh, "--out", str(out), "--export", artifact])
        predict_maskplanner.main()
        name = os.path.splitext(os.path.basename(mesh))[0]
        assert (out / f"{name}.txt").is_file()
        assert os.path.getsize(artifact) > 0
        assert "poses" in capsys.readouterr().out

        # serve the same mesh from the exported artifact
        monkeypatch.setattr(sys, "argv", [
            "predict_maskplanner.py", "--run", run_dir, "--model", "last",
            "--from_export", artifact, "--meshes", mesh,
            "--out", str(tmp_path / "programs2")])
        predict_maskplanner.main()
        a = np.genfromtxt(out / f"{name}.txt", delimiter=";", skip_header=1)
        b = np.genfromtxt(tmp_path / "programs2" / f"{name}.txt",
                          delimiter=";", skip_header=1)
        # the artifact forward is ulp-equal (proven above), but the
        # discrete postprocess (greedy filters, resampling, Euler
        # align_vectors) legitimately amplifies ulps — assert structural
        # equivalence, not bitwise file equality
        assert a.shape[1] == b.shape[1] == 7
        assert np.isfinite(b).all()
        assert abs(a.shape[0] - b.shape[0]) <= 0.1 * a.shape[0]
        assert len(np.unique(a[:, 6])) == len(np.unique(b[:, 6]))
