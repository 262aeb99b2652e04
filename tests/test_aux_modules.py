"""Coverage for previously-untested aux modules: beam search, prefetch,
logging, profiling, parallel-coordinates plots."""
import json
import os

import numpy as np
import pytest


class TestBeamsearch:
    def test_tour_is_valid_permutation(self):
        """Walking backpointers of the top beam yields a valid TSP tour
        visiting every node exactly once (reference nar_beam_search
        semantics; used for segment-ordering experiments)."""
        from maskplanner_tpu.postprocess.beam_search import Beamsearch

        rng = np.random.default_rng(0)
        B, K, N = 2, 3, 6
        bs = Beamsearch(K, B, N, start_nodes=np.zeros((B, K), np.int64))
        for _ in range(N - 1):
            # mask handles visited nodes (1e10 entries flip the argsort),
            # so random negative log-probs suffice
            probs = -rng.random((B, K, N))
            bs.advance(probs)
        # top beam of each batch element (beam axis = 1)
        tours = bs.get_hypothesis(np.zeros((B, 1), np.int64))
        for b in range(B):
            assert sorted(tours[b].tolist()) == list(range(N)), tours[b]

    def test_module_get_best_helper(self):
        from maskplanner_tpu.postprocess.beam_search import get_best

        seqs = np.arange(12).reshape(3, 4)
        cost = np.array([3.0, 1.0, 2.0])
        s, c = get_best(seqs, cost)
        np.testing.assert_array_equal(s[0], seqs[1])
        assert float(c[0]) == 1.0


class TestPrefetcher:
    def test_yields_same_batches_as_loader(self, tmp_path):
        from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
        from maskplanner_tpu.data.prefetch import Prefetcher
        from maskplanner_tpu.utils.args import load_args

        cfg = load_args(argv=[
            "config=[maskplanner,cuboids_v2,longx_v2,debug]",
            "pc_points=64", "n_pred_traj_points=80"])
        ds = PaintDataset(cfg, split="train", size=4)
        loader = DataLoader(ds, 2, shuffle=True, seed=5)
        direct = list(loader.epoch(1))
        fetched = list(Prefetcher(loader).epoch(1))
        assert len(direct) == len(fetched) == 2
        for d, f in zip(direct, fetched):
            np.testing.assert_array_equal(
                np.asarray(d["point_cloud"]), np.asarray(f["point_cloud"]))
            np.testing.assert_array_equal(
                np.asarray(d["traj"]), np.asarray(f["traj"]))


class TestRunLogging:
    def test_jsonl_and_summary(self, tmp_path):
        from maskplanner_tpu.utils.logging import Run

        run = Run(str(tmp_path), config={"a": 1}, mode="disabled")
        run.log({"train_loss": 1.5, "epoch": 1}, step=1)
        run.log({"train_loss": np.float32(0.75), "epoch": 2}, step=2)
        run.summary["best"] = 0.75
        run.finish()
        logs = [json.loads(l) for l in
                open(os.path.join(tmp_path, "logs.jsonl"))]
        assert [l["train_loss"] for l in logs] == [1.5, 0.75]
        summary = json.load(open(os.path.join(tmp_path, "summary.json")))
        assert summary["best"] == 0.75


class TestProfiling:
    def test_exceptions_propagate_through_profile_trace(self, tmp_path):
        """A training error inside the profiled region must propagate
        untouched (regression: a second yield in the except branch turned
        it into contextlib's 'generator didn't stop' RuntimeError)."""
        from maskplanner_tpu.utils.profiling import profile_trace

        with pytest.raises(ZeroDivisionError):
            with profile_trace(str(tmp_path), enabled=True):
                1 / 0

    def test_disabled_is_noop(self, tmp_path):
        from maskplanner_tpu.utils.profiling import profile_trace

        with profile_trace(str(tmp_path), enabled=False):
            pass
        assert not os.path.exists(os.path.join(tmp_path, "profile")) or \
            not os.listdir(os.path.join(tmp_path, "profile"))

    def test_step_timer(self):
        from maskplanner_tpu.utils.profiling import StepTimer

        t = StepTimer()
        with t.phase("load"):
            pass
        with t.phase("load"):
            pass
        s = t.summary()
        assert "load" in next(iter([s])) or any("load" in k for k in s)


class TestPCP:
    def test_parallel_coordinates_png(self, tmp_path):
        from maskplanner_tpu.viz.pcp import parallel_coordinates_plot

        data = [{"lr": 1e-3, "epochs": 100, "pcd": 15.0},
                {"lr": 1e-4, "epochs": 200, "pcd": 12.0},
                {"lr": 3e-4, "epochs": 150, "pcd": 13.5}]
        out = tmp_path / "pcp.png"
        parallel_coordinates_plot(data, ["lr", "epochs", "pcd"],
                                  color_by="pcd", save_path=str(out))
        assert out.stat().st_size > 0

    def test_degenerate_limits_stay_finite(self):
        """Constant columns (incl. negative) and lo==hi caller limits
        must neither divide by zero nor invert the range."""
        import numpy as np
        import matplotlib
        matplotlib.use("Agg")
        from maskplanner_tpu.viz.pcp import _auto_limits, pcp

        mat = np.array([[-10.0, -10.0], [0.0, 0.0], [5.0, 5.0]])
        lin = [[]] * 3
        lims = _auto_limits(mat, 3, None, lin)
        for lo, hi in lims:
            assert hi > lo
        lims2 = _auto_limits(mat, 3, [[1.0, 2.0], [], [5.0, 5.0]], lin)
        assert lims2[0] == [1.0, 2.0] and lims2[2][1] > lims2[2][0]

        fig = pcp([[-10.0, 0.0, 5.0], [-10.0, 1.0, 5.0]],
                  ["a", "b", "obj"])
        import matplotlib.pyplot as plt
        plt.close(fig)

    def test_log_axis_constant_column_stays_positive(self):
        """A constant column on a log-typed axis must widen
        multiplicatively: an additive pad would push the lower limit
        nonpositive and poison log10 (NaN curves / matplotlib errors)."""
        import numpy as np
        import matplotlib
        matplotlib.use("Agg")
        from maskplanner_tpu.viz.pcp import _auto_limits, pcp
        import matplotlib.pyplot as plt

        mat = np.array([[1e-3, 1e-3]])
        (lo, hi), = _auto_limits(mat, 1, None, ["log"])
        assert 0 < lo < 1e-3 < hi

        # end to end: every sweep run used lr=1e-3 on a log axis
        fig = pcp([[1e-3, 0.0, 1.0], [1e-3, 5.0, 2.0]],
                  ["lr", "b", "obj"], ytype=["log", [], []], curves=False)
        for line in fig.axes[0].lines:
            assert np.isfinite(line.get_ydata()).all()
        plt.close(fig)

    def test_log_first_axis_maps_through_ax0_transform(self):
        """Secondary columns on a log-scaled first axis must land at
        the pixel height their own twin-axis ticks claim (t fraction of
        the log range, not of the linear range)."""
        import numpy as np
        from maskplanner_tpu.viz.pcp import pcp
        import matplotlib.pyplot as plt

        # col0 log in [1, 100]; col1 linear in [0, 10]. A col1 value of
        # 5.0 (t=0.5) must render at sqrt(1*100)=10 in ax0 data coords.
        fig = pcp([[1.0, 0.0, 1.0], [100.0, 5.0, 2.0],
                   [10.0, 10.0, 3.0]],
                  ["a", "b", "obj"], ytype=["log", [], []],
                  curves=False)
        ax0 = fig.axes[0]
        line = ax0.lines[1]  # second run: [100.0, 5.0, 2.0]
        y_col1 = line.get_ydata()[1]
        assert np.isclose(y_col1, 10.0, rtol=1e-6), y_col1
        plt.close(fig)
