"""Spray-deposition simulator stand-in + coverage-metric closure.

The reference's coverage metric (reference
``standalone/compute_paint_coverage_per_face.py:62-114``) needs per-face
thickness CSVs from a proprietary simulator; ``maskplanner_tpu.sim``
replaces that external boundary with a geometric deposition model so the
train -> export -> simulate -> coverage loop closes in-repo.
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "standalone"))

from maskplanner_tpu.sim import (  # noqa: E402
    facevertex_thickness,
    simulate_program,
    simulate_spray,
    surface_centroid,
    write_thickness_csv,
)
from maskplanner_tpu.sim.spray import _auto_sign  # noqa: E402

CUBE_V = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                   for z in (-1, 1)], np.float64)
CUBE_F = np.array([
    [0, 1, 3], [0, 3, 2],      # -x
    [4, 6, 7], [4, 7, 5],      # +x
    [0, 4, 5], [0, 5, 1],      # -y
    [2, 3, 7], [2, 7, 6],      # +y
    [0, 2, 6], [0, 6, 4],      # -z
    [1, 5, 7], [1, 7, 3],      # +z
], np.int64)


def raster_over_top(n=64, standoff=1.5, z=1.0):
    """Boustrophedon gun poses above the +z face, spraying down."""
    side = int(np.sqrt(n))
    us = np.linspace(-0.8, 0.8, side)
    pos = np.stack(np.meshgrid(us, us, indexing="ij"), -1).reshape(-1, 2)
    positions = np.concatenate(
        [pos, np.full((pos.shape[0], 1), z + standoff)], axis=1)
    dirs = np.tile([0.0, 0.0, -1.0], (positions.shape[0], 1))
    return positions, dirs


class TestDepositionModel:
    def test_beam_hits_target_point_hardest(self):
        pts = np.array([[0, 0, 1.0], [0.9, 0.9, 1.0], [0, 0, -1.0]])
        nrm = np.array([[0, 0, 1.0], [0, 0, 1.0], [0, 0, -1.0]])
        pos = np.array([[0.0, 0.0, 2.5]])
        d = np.array([[0.0, 0.0, -1.0]])
        t = simulate_spray(pts, nrm, pos, d)
        assert t[0] > t[1]          # off-axis Gaussian falloff
        assert t[2] == 0.0          # back face: culled + outside cone
        assert t[0] == pytest.approx(1.0, rel=1e-6)  # flux 1 at standoff

    def test_inverse_square_and_incidence(self):
        pts = np.array([[0, 0, 0.0], [0, 0, -1.0]])
        nrm = np.array([[0, 0, 1.0], [0, 0, 1.0]])
        pos = np.array([[0.0, 0.0, 1.0]])
        d = np.array([[0.0, 0.0, -1.0]])
        t = simulate_spray(pts, nrm, pos, d, r0=1.0)
        assert t[0] == pytest.approx(1.0)
        assert t[1] == pytest.approx(1.0 / 4.0)  # twice the distance

    def test_cone_cutoff(self):
        pts = np.array([[np.tan(np.deg2rad(45.0)) * 2, 0, 0.0]])
        nrm = np.array([[0, 0, 1.0]])
        pos = np.array([[0.0, 0.0, 2.0]])
        d = np.array([[0.0, 0.0, -1.0]])
        t = simulate_spray(pts, nrm, pos, d, cone_deg=30.0)
        assert t[0] == 0.0

    def test_top_face_raster_paints_top_not_bottom(self):
        positions, dirs = raster_over_top()
        t = facevertex_thickness(CUBE_V, CUBE_F, positions, dirs)
        per_face = t.reshape(-1, 3).mean(axis=1)
        top, bottom = per_face[10:12], per_face[8:10]
        assert top.min() > 0.0
        assert np.all(bottom == 0.0)
        assert top.min() > 10.0 * per_face[:8].max()

    def test_auto_sign_flips_outward_convention(self):
        positions, dirs = raster_over_top()
        c = surface_centroid(CUBE_V, CUBE_F)
        assert _auto_sign(positions, dirs, c) == 1.0
        assert _auto_sign(positions, -dirs, c) == -1.0

    def test_surface_centroid_area_weighted(self):
        c = surface_centroid(CUBE_V, CUBE_F)
        np.testing.assert_allclose(c, 0.0, atol=1e-12)
        # shifted cube
        c2 = surface_centroid(CUBE_V + np.array([1.0, 2.0, 3.0]), CUBE_F)
        np.testing.assert_allclose(c2, [1.0, 2.0, 3.0], atol=1e-12)


class TestProgramRoundtrip:
    def _write_mesh(self, path, shift=(0, 0, 0)):
        with open(path, "w") as f:
            for v in CUBE_V + np.asarray(shift, np.float64):
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for a, b, c in CUBE_F:
                f.write(f"f {a+1} {b+1} {c+1}\n")

    def _write_program(self, path, positions, dirs):
        from maskplanner_tpu.data.io import orientnorm_to_euler, \
            save_traj_file
        euler = orientnorm_to_euler(dirs)
        rows = np.concatenate(
            [positions, euler, np.zeros((len(positions), 1))], axis=1)
        save_traj_file(rows, path, kind="euler")

    def test_gt_self_coverage_is_100pct(self, tmp_path):
        """Same program as GT and pred -> coverage exactly 1.0."""
        from compute_paint_coverage_per_face import (
            coverage_for_pair, get_thicknesses_values_per_face)

        mesh = tmp_path / "obj.obj"
        self._write_mesh(mesh)
        prog = tmp_path / "prog.txt"
        positions, dirs = raster_over_top()
        self._write_program(prog, positions, dirs)

        out = tmp_path / "thick.txt"
        t = simulate_program(str(mesh), str(prog), str(out))
        assert t.shape == (3 * len(CUBE_F),)
        faces = get_thicknesses_values_per_face(str(out))
        assert faces.shape == (len(CUBE_F),)
        np.testing.assert_allclose(faces, t.reshape(-1, 3).mean(1))
        assert coverage_for_pair(faces, faces, percentile=10) == 1.0

    def test_mesh_centering_matches_origin_frame(self, tmp_path):
        """Programs are exported around the origin; a shifted mesh must
        yield the same thickness after auto-centering."""
        m0, m1 = tmp_path / "a.obj", tmp_path / "b.obj"
        self._write_mesh(m0)
        self._write_mesh(m1, shift=(10.0, -5.0, 3.0))
        prog = tmp_path / "prog.txt"
        positions, dirs = raster_over_top()
        self._write_program(prog, positions, dirs)
        t0 = simulate_program(str(m0), str(prog))
        t1 = simulate_program(str(m1), str(prog))
        np.testing.assert_allclose(t0, t1, rtol=1e-9)

    def test_shifted_prediction_degrades_coverage(self, tmp_path):
        from compute_paint_coverage_per_face import (
            coverage_for_pair, get_thicknesses_values_per_face)

        mesh = tmp_path / "obj.obj"
        self._write_mesh(mesh)
        positions, dirs = raster_over_top()
        gt_prog, bad_prog = tmp_path / "gt.txt", tmp_path / "bad.txt"
        self._write_program(gt_prog, positions, dirs)
        # half the raster shifted far off the object
        bad = positions.copy()
        bad[: len(bad) // 2, 0] += 5.0
        self._write_program(bad_prog, bad, dirs)

        gt_t = tmp_path / "gt_t.txt"
        bad_t = tmp_path / "bad_t.txt"
        simulate_program(str(mesh), str(gt_prog), str(gt_t))
        simulate_program(str(mesh), str(bad_prog), str(bad_t))
        gt = get_thicknesses_values_per_face(str(gt_t))
        pred = get_thicknesses_values_per_face(str(bad_t))
        cov = coverage_for_pair(gt, pred, percentile=10)
        assert 0.0 < cov < 1.0

    def test_cli_driver(self, tmp_path, monkeypatch):
        import simulate_spray_thickness as cli

        cat = tmp_path / "cat"
        (cat / "item_a").mkdir(parents=True)
        self._write_mesh(cat / "item_a" / "item_a.obj")
        progs = tmp_path / "programs" / "gt_cat"
        progs.mkdir(parents=True)
        positions, dirs = raster_over_top(n=16)
        self._write_program(progs / "item_a.txt", positions, dirs)

        monkeypatch.setattr(sys, "argv", [
            "simulate_spray_thickness.py", "--programs", str(progs),
            "--meshes", str(cat), "--out", str(tmp_path / "thick")])
        cli.main()
        out = tmp_path / "thick" / "gt_cat" / "item_a.txt"
        assert out.is_file()
        vals = np.genfromtxt(out, delimiter=";")
        assert vals.shape == (3 * len(CUBE_F), 2)
        assert np.isfinite(vals).all() and (vals[:, 1] >= 0).all()


class TestCoverageClosureE2E:
    """The full loop the reference couldn't close in-repo (VERDICT item
    2): fabricated disk category -> train -> eval dumps -> program
    export -> spray simulation -> paint-coverage %."""

    @pytest.fixture(scope="class")
    def loop(self, tmp_path_factory):
        from maskplanner_tpu.data.fixture_category import write_category
        from maskplanner_tpu.utils.args import load_args
        import train_maskplanner

        tmp = tmp_path_factory.mktemp("covloop")
        root = tmp / "paintnet"
        cat_dir = write_category(str(root), "minibox-v1", n_train=2,
                                 n_test=2, seed=3)
        os.environ["PAINTNET_ROOT"] = str(root)
        try:
            cfg = load_args(argv=[
                "config=[maskplanner,cuboids_v2,longx_v2,debug]",
                "dataset=minibox-v1", "pc_points=64", "traj_points=240",
                "n_pred_traj_points=120", "batch_size=2", "epochs=2",
                "eval_freq=2", "no_save=false", "seed=0",
                "data_scale_factor=700.0", "max_n_strokes=8",
                "traj_with_equally_spaced_points=false",
                f"output_dir={tmp}"])
            run_dir, _ = train_maskplanner.main(cfg)

            import test_maskplanner as eval_driver
            old = sys.argv
            sys.argv = ["test_maskplanner.py", "--run", run_dir,
                        "--model", "last", "--save", "--split", "test"]
            try:
                eval_driver.main()
            finally:
                sys.argv = old

            import from_pred_to_offline_v2 as export_tool
            progs = tmp / "programs"
            sys.argv = ["from_pred_to_offline_v2.py", "--run", run_dir,
                        "--output_dir", str(progs), "--model", "last"]
            try:
                export_tool.main()
            finally:
                sys.argv = old
            return dict(tmp=tmp, cat_dir=cat_dir, progs=progs)
        finally:
            os.environ.pop("PAINTNET_ROOT", None)

    @pytest.mark.slow
    def test_export_simulate_coverage(self, loop):
        from compute_paint_coverage_per_face import (
            coverage_for_pair, get_thicknesses_values_per_face)

        gt_dir = loop["progs"] / "gt_minibox-v1"
        pred_dir = loop["progs"] / "pred_minibox-v1"
        names = sorted(os.listdir(gt_dir))
        assert names and sorted(os.listdir(pred_dir)) == names

        gt_covs, pred_covs = [], []
        for fname in names:
            name = os.path.splitext(fname)[0]
            mesh = os.path.join(loop["cat_dir"], name, f"{name}.obj")
            orig_prog = os.path.join(loop["cat_dir"], name,
                                     f"{name}_trajectory.txt")
            truth = simulate_program(mesh, orig_prog).reshape(-1, 3).mean(1)
            gt = simulate_program(
                mesh, str(gt_dir / fname)).reshape(-1, 3).mean(1)
            pred = simulate_program(
                mesh, str(pred_dir / fname)).reshape(-1, 3).mean(1)
            gt_covs.append(coverage_for_pair(truth, gt, percentile=10))
            pred_covs.append(coverage_for_pair(truth, pred, percentile=10))

        # the exported GT is the original program after lambda-
        # segmentation + normalization roundtrip: near-lossless
        assert np.mean(gt_covs) >= 0.9, gt_covs
        # untrained-model coverage: just a well-defined, reportable number
        assert all(0.0 <= c <= 1.0 for c in pred_covs)

    @pytest.mark.slow
    def test_simulate_cli_and_coverage_render(self, loop, monkeypatch):
        """Drive the simulate CLI over the exported programs, then the
        render driver's coverage-colored mesh figure on its output."""
        import simulate_spray_thickness as cli

        thick = loop["tmp"] / "thickness"
        monkeypatch.setattr(sys, "argv", [
            "simulate_spray_thickness.py", "--programs",
            str(loop["progs"] / "gt_minibox-v1"),
            str(loop["progs"] / "pred_minibox-v1"),
            "--meshes", loop["cat_dir"], "--out", str(thick)])
        cli.main()
        gt_out = sorted(os.listdir(thick / "gt_minibox-v1"))
        assert gt_out and sorted(os.listdir(
            thick / "pred_minibox-v1")) == gt_out

        from render_results import render_coverage

        name = os.path.splitext(gt_out[0])[0]
        args = type("A", (), dict(
            coverage_meshes=loop["cat_dir"],
            thickness_gt=str(thick / "gt_minibox-v1"),
            thickness_pred=str(thick / "pred_minibox-v1"),
            coverage_percentile=10))
        out_png = loop["tmp"] / "coverage.png"
        cov = render_coverage(args, name, str(out_png))
        assert cov is not None and 0.0 <= cov <= 1.0
        assert out_png.stat().st_size > 0


def test_write_thickness_csv_format(tmp_path):
    path = tmp_path / "t.txt"
    write_thickness_csv(str(path), np.array([0.5, 1.5, 2.5]))
    rows = [line.strip().split(";") for line in open(path)]
    assert rows == [["0", "0.5"], ["1", "1.5"], ["2", "2.5"]]


class TestSubdividedFixtureMesh:
    """box_mesh(max_edge=...) — the metric-resolution upgrade.

    The coverage metric is per mesh face (reference
    compute_paint_coverage_per_face.py:62-114); real category meshes have
    thousands of faces, so the fixture must too or coverage quantizes.
    """

    def test_subdivision_outward_normals_and_area(self):
        import numpy as np
        from maskplanner_tpu.data.fixture_category import box_mesh

        dims = np.array([1.0, 0.8, 1.3])
        verts, tris = box_mesh(dims, max_edge=0.15)
        assert len(tris) > 400
        tri = verts[tris]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        areas = 0.5 * np.linalg.norm(n, axis=-1)
        n = n / np.maximum(areas[:, None] * 2, 1e-12)
        centers = tri.mean(1)
        # every triangle's normal points away from the box center
        assert ((n * centers).sum(-1) > 0).all()
        expected = 2 * (dims[0] * dims[1] + dims[0] * dims[2]
                        + dims[1] * dims[2])
        assert abs(areas.sum() - expected) < 1e-9

    def test_deterministic_fixture_gt_roundtrip_on_fine_mesh(self, tmp_path):
        import numpy as np
        from maskplanner_tpu.data.fixture_category import (
            generate_item, write_obj)
        from maskplanner_tpu.sim import simulate_program

        verts, tris, traj, ids = generate_item(
            "cuboids-v2", 3, seed=7, deterministic=True, mesh_max_edge=0.12)
        # deterministic programs: strokes vary with geometry (multi-pass
        # on large faces) and regenerating gives identical output
        v2, t2, traj2, ids2 = generate_item(
            "cuboids-v2", 3, seed=7, deterministic=True, mesh_max_edge=0.12)
        np.testing.assert_array_equal(traj, traj2)
        assert ids.max() + 1 >= 5

        mesh = tmp_path / "m.obj"
        write_obj(str(mesh), verts, tris)
        prog = tmp_path / "p.txt"
        from maskplanner_tpu.data.io import orientnorm_to_euler, \
            save_traj_file
        rows = np.concatenate(
            [traj[:, :3], orientnorm_to_euler(traj[:, 3:6]),
             ids[:, None].astype(np.float64)], axis=1)
        save_traj_file(rows, str(prog), kind="euler")
        th = simulate_program(str(mesh), str(prog)).reshape(-1, 3).mean(1)
        nz = th[~np.isclose(th, 0.0)]
        # all 5 painted faces' triangles receive well-above-threshold paint
        assert len(nz) > 0.6 * len(th)
