"""Standalone-tool parity vs the reference's own scripts.

Imports the reference ``standalone/from_pred_to_offline_v2.py`` and
``standalone/compute_paint_coverage_per_face.py`` (module-level argparse
patched) and asserts this repo reproduces:

- ``from_normals_to_euler_angles`` (Rot.align_vectors, the simulator-export
  orientation convention) == ``data/io.py orientnorm_to_euler``
- ``compute_total_path_length`` (per-stroke-id accumulation)
- the paint-coverage script end-to-end on fabricated thickness CSVs
  (the paper's ">99% coverage" metric math)
"""
import contextlib
import importlib.util
import io
import os
import re
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from ref_harness import REFERENCE, install_stubs  # noqa: E402

install_stubs()

from maskplanner_tpu.data.io import orientnorm_to_euler  # noqa: E402
from maskplanner_tpu.postprocess import (  # noqa: E402
    compute_total_path_length)


def _import_ref_script(name, script_argv):
    """Import a reference standalone/ script, patching the module-level
    ``args = parse_args()`` argparse call.

    The reference scripts insert their parent dir (== REFERENCE) into
    sys.path THEMSELVES at import ("trick to import paintnet_utils",
    e.g. from_pred_to_offline_v2.py:32-34) — strip every occurrence we
    didn't start with, or `import train_maskplanner` in later tests
    resolves to the reference's driver."""
    path = os.path.join(REFERENCE, "standalone", name + ".py")
    argv, sys.argv = sys.argv, ["x"] + script_argv
    before = sys.path.count(REFERENCE)
    sys.path.insert(0, REFERENCE)
    sys.dont_write_bytecode = True
    try:
        spec = importlib.util.spec_from_file_location("ref_" + name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.argv = argv
        while sys.path.count(REFERENCE) > before:
            sys.path.remove(REFERENCE)
    return mod


ref_offline = _import_ref_script("from_pred_to_offline_v2",
                                 ["--run", "/tmp"])
ref_coverage = _import_ref_script("compute_paint_coverage_per_face",
                                  ["--gt-run", "/tmp"])


class TestNormalsToEuler:
    def test_random_unit_normals(self):
        rng = np.random.default_rng(0)
        normals = rng.normal(size=(60, 3))
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        ours = orientnorm_to_euler(normals)
        for i, n in enumerate(normals):
            ref = ref_offline.from_normals_to_euler_angles(n.copy())
            np.testing.assert_allclose(ours[i], ref, rtol=1e-9, atol=1e-9)

    def test_axis_aligned(self):
        for n in [np.array([0.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0]),
                  np.array([1.0, 0.0, 0.0])]:
            ref = ref_offline.from_normals_to_euler_angles(n.copy())
            np.testing.assert_allclose(
                orientnorm_to_euler(n[None])[0], ref, atol=1e-9)

    def test_roundtrip_via_reader_convention(self):
        """Euler angles from the export path must parse back to the same
        normal through the reader's yzx convention (data/io.py)."""
        from scipy.spatial.transform import Rotation as Rot

        rng = np.random.default_rng(1)
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        a, b, c = orientnorm_to_euler(n[None])[0]  # (A=x, B=y, C=z)
        rec = Rot.from_euler("yzx", [b, c, a], degrees=True).apply(
            [1.0, 0.0, 0.0])
        np.testing.assert_allclose(rec, n, atol=1e-9)


def test_total_path_length_parity():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(40, 6)) * 10
    ids = np.sort(rng.integers(0, 5, size=40)).astype(np.float64)
    traj7 = np.concatenate([pts, ids[:, None]], axis=1)
    ref = ref_offline.compute_total_path_length(traj7)
    assert abs(compute_total_path_length(traj7) - ref) < 1e-9
    # single-point strokes skipped on both sides
    traj_single = np.concatenate(
        [rng.normal(size=(3, 6)), np.array([[0.0], [1.0], [2.0]])], axis=1)
    assert abs(compute_total_path_length(traj_single)
               - ref_offline.compute_total_path_length(traj_single)) < 1e-12


class TestCoverageScriptParity:
    def _write_run(self, root, name, per_face, rng):
        """Simulator CSV: 3 vertex rows per face, ';'-separated id;value."""
        d = root / name
        d.mkdir()
        for item, faces in per_face.items():
            rows = []
            for f in faces:
                # three vertex thicknesses whose mean is exactly `f`
                eps = rng.uniform(0, min(f, 0.3)) if f > 0 else 0.0
                rows += [f - eps, f + eps, f]
            with open(d / item, "w", encoding="utf-8") as fh:
                for i, v in enumerate(rows):
                    print(f"{i};{v}", file=fh)
        return str(d)

    @pytest.mark.parametrize("percentile", [10, 25])
    def test_end_to_end(self, tmp_path, percentile, capsys):
        rng = np.random.default_rng(3)
        items = ["a.csv", "b.csv"]
        gt = {it: np.concatenate([np.zeros(4), rng.uniform(1, 9, 26)])
              for it in items}
        pred1 = {it: rng.uniform(0, 9, 30) for it in items}
        pred2 = {it: gt[it] * rng.uniform(0.6, 1.4, 30) for it in items}

        gt_dir = self._write_run(tmp_path, "gt", gt, rng)
        p1_dir = self._write_run(tmp_path, "p1", pred1, rng)
        p2_dir = self._write_run(tmp_path, "p2", pred2, rng)

        # reference script: main() reads module-level args
        ref_coverage.args.gt_run = gt_dir
        ref_coverage.args.runs = [p1_dir, p2_dir]
        ref_coverage.args.percentile = percentile
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            ref_coverage.main()
        m = re.search(r"FINAL MEAN COVERAGES:\s*\n?\s*\[([^\]]+)\]",
                      buf.getvalue())
        assert m, buf.getvalue()
        ref_means = np.array([float(x) for x in m.group(1).split()])

        # this repo's script
        import importlib

        spec = importlib.util.spec_from_file_location(
            "mp_coverage", "standalone/compute_paint_coverage_per_face.py")
        mp_cov = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mp_cov)
        argv, sys.argv = sys.argv, [
            "x", "--gt-run", gt_dir, "--runs", p1_dir, p2_dir,
            "--percentile", str(percentile)]
        try:
            ours = mp_cov.main()
        finally:
            sys.argv = argv
        our_means = np.round(np.mean(ours, axis=1) * 100, 2)

        np.testing.assert_allclose(our_means, ref_means, atol=1e-9)
        capsys.readouterr()

    def test_per_face_reader_parity(self, tmp_path):
        rng = np.random.default_rng(4)
        d = self._write_run(tmp_path, "r",
                            {"m.csv": rng.uniform(0, 5, 12)}, rng)
        path = os.path.join(d, "m.csv")
        ref = ref_coverage.get_thicknesses_values_per_face(path)
        import importlib

        spec = importlib.util.spec_from_file_location(
            "mp_coverage2", "standalone/compute_paint_coverage_per_face.py")
        mp_cov = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mp_cov)
        ours = mp_cov.get_thicknesses_values_per_face(path)
        np.testing.assert_allclose(ours, ref, rtol=1e-12)
