"""Viz parity additions: mesh-surface rendering, paint-coverage face
coloring, mp4 animation, full pcp API (VERDICT round-1 item 7).

Reference: ``utils/visualize.py:654-721`` (coverage-colored mesh),
``:1111-1147`` (face colors), ``render_results.py:255-275`` (movie mode),
``utils/pcp.py`` (parallel-coordinates plotting)."""
import os

import numpy as np
import pytest

from maskplanner_tpu.viz.render import (
    get_mesh_face_colors,
    visualize_coverage_mesh,
    visualize_mesh_faces,
    visualize_mesh_traj,
    visualize_mesh_traj_animated,
)

CUBE_V = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                   for z in (-1, 1)], np.float64)
CUBE_F = np.array([
    [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
    [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
    [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int64)


class TestFaceColors:
    def test_mean_of_vertex_triplets(self):
        vt = np.arange(36, dtype=np.float64)
        fc = get_mesh_face_colors(CUBE_V, CUBE_F, vt)
        assert fc.shape == (12,)
        np.testing.assert_allclose(fc, vt.reshape(-1, 3).mean(1))

    def test_clamp_and_normalize(self):
        vt = np.arange(36, dtype=np.float64)
        fc = get_mesh_face_colors(CUBE_V, CUBE_F, vt, clamp=10.0)
        assert fc.max() == 10.0
        fc = get_mesh_face_colors(CUBE_V, CUBE_F, vt, normalize_to_max=2.0)
        assert fc.max() == pytest.approx(2.0)

    def test_wrong_length_asserts(self):
        with pytest.raises(AssertionError):
            get_mesh_face_colors(CUBE_V, CUBE_F, np.zeros(35))


class TestMeshSurfaceRendering:
    def test_plain_and_colored_faces(self, tmp_path):
        import matplotlib.pyplot as plt

        fig = plt.figure()
        ax = fig.add_subplot(111, projection="3d")
        coll = visualize_mesh_faces(ax, CUBE_V, CUBE_F)
        assert coll is not None
        ax2 = fig.add_subplot(111, projection="3d")
        visualize_mesh_faces(ax2, CUBE_V, CUBE_F,
                             face_colors=np.arange(12.0),
                             below_threshold=6.0)
        plt.close(fig)

    def test_visualize_mesh_traj_with_mesh_surface(self, tmp_path):
        traj = np.concatenate(
            [np.linspace([-1, 0, 1.4], [1, 0, 1.4], 20),
             np.tile([0, 0, -1.0], (20, 1))], axis=1)
        out = tmp_path / "mesh.png"
        visualize_mesh_traj(np.zeros((1, 3)), traj,
                            stroke_ids=np.zeros(20, np.int64),
                            save_path=str(out), mesh=(CUBE_V, CUBE_F))
        assert out.stat().st_size > 0

    def test_coverage_figure_and_fraction(self, tmp_path):
        gt = np.zeros(36)
        gt[30:] = 5.0           # only +z faces painted
        pred = np.zeros(36)
        pred[30:33] = 5.0       # pred covers one of the two top faces
        out = tmp_path / "cov.png"
        cov = visualize_coverage_mesh(CUBE_V, CUBE_F, pred, gt,
                                      percentile=10, save_path=str(out))
        assert cov == pytest.approx(0.5)
        assert out.stat().st_size > 0


class TestAnimationFormats:
    def _traj(self):
        return np.linspace([-1, 0, 1.4, 0, 0, -1],
                           [1, 0, 1.4, 0, 0, -1], 24)

    def test_gif(self, tmp_path):
        out = tmp_path / "a.gif"
        visualize_mesh_traj_animated(np.zeros((4, 3)), self._traj(),
                                     save_path=str(out), n_frames=4)
        assert out.stat().st_size > 0

    def test_mp4_via_cv2(self, tmp_path):
        pytest.importorskip("cv2")
        out = tmp_path / "a.mp4"
        visualize_mesh_traj_animated(np.zeros((4, 3)), self._traj(),
                                     save_path=str(out), n_frames=4)
        assert out.stat().st_size > 0
        # container is readable again
        import cv2

        cap = cv2.VideoCapture(str(out))
        ok, frame = cap.read()
        cap.release()
        assert ok and frame is not None


class TestPcpFullApi:
    ROWS = [["ResNet", 0.0001, 4, 0.2],
            ["ResNet", 0.0003, 8, 1.0],
            ["DenseNet", 0.0005, 4, 0.65],
            ["DenseNet", 0.0007, 8, 0.45],
            ["DenseNet", 0.001, 2, 0.8]]
    LABELS = ["Network", "Learning rate", "Batchsize", "F-Score"]

    def test_mixed_categorial_linear(self, tmp_path):
        from maskplanner_tpu.viz.pcp import pcp

        fig = pcp([list(r) for r in self.ROWS], self.LABELS)
        out = tmp_path / "pcp.png"
        fig.savefig(out)
        assert out.stat().st_size > 0

    def test_log_axis_and_no_colorbar_polyline(self, tmp_path):
        from maskplanner_tpu.viz.pcp import pcp

        fig = pcp([list(r) for r in self.ROWS], self.LABELS,
                  ytype=[[], "log", [], []], curves=False, colorbar=False)
        fig.savefig(tmp_path / "pcp2.png")

    def test_colorbar_requires_linear_last_axis(self):
        from maskplanner_tpu.viz.pcp import pcp

        rows = [["a", "x"], ["b", "y"]]
        with pytest.raises(AssertionError):
            pcp(rows, ["c1", "c2"], colorbar=True)

    def test_load_csv_types(self, tmp_path):
        from maskplanner_tpu.viz.pcp import load_csv

        p = tmp_path / "sweep.csv"
        p.write_text("net,lr,bs,score\nResNet,0.001,4,0.5\nVGG,1e-4,8,0.7\n")
        rows, header = load_csv(str(p))
        assert header == ["net", "lr", "bs", "score"]
        assert rows[0] == ["ResNet", 0.001, 4, 0.5]
        assert isinstance(rows[0][2], int)
        assert isinstance(rows[1][1], float)  # 1e-4 via exponent

    def test_custom_ylim_and_ylabels(self, tmp_path):
        from maskplanner_tpu.viz.pcp import pcp

        fig = pcp([list(r) for r in self.ROWS], self.LABELS,
                  ylim=[[], [0, 0.002], [0, 16], [0, 1]],
                  ylabels=[["DenseNet", "ResNet", "VGG"], [], [], []])
        fig.savefig(tmp_path / "pcp3.png")
