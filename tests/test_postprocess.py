"""Postprocess pipeline: mask->id extraction, segment filtering,
concatenation/ordering, resampling/smoothing, visualization alignment.

Reference semantics: utils/postprocessing.py + utils/cluster.py.
"""
import numpy as np
import pytest

from maskplanner_tpu.utils.args import load_args


def cfg(**over):
    argv = ["config=[maskplanner,cuboids_v2]"]
    argv += [f"{k}={v}" for k, v in over.items()]
    return load_args(argv=argv)


def make_stroke_segments(n_seg=20, lam=4, outdim=6, seed=0, noise=0.0):
    """One smooth stroke chopped into ordered λ-segments."""
    rng = np.random.default_rng(seed)
    ts = np.linspace(0, 2.0, n_seg * lam)
    pts = np.stack([np.cos(ts), np.sin(ts), 0.2 * ts], axis=-1)
    if noise:
        pts = pts + rng.normal(0, noise, pts.shape)
    pose = np.concatenate([pts, np.tile([0, 0, 1.0], (len(ts), 1))], axis=-1)
    return pose.reshape(n_seg, lam * outdim).astype(np.float64)


class TestStrokeIdExtraction:
    def test_confident_masks_win(self):
        from maskplanner_tpu.postprocess.stroke_ids import (
            process_pred_stroke_masks_to_stroke_ids)

        B, M, S = 2, 4, 10
        masks = np.full((B, M, S), -5.0)
        # mask 0 claims segments 0-4, mask 2 claims 5-9; mask 1 is strong
        # everywhere but low-confidence -> filtered out
        masks[:, 0, :5] = 5.0
        masks[:, 2, 5:] = 5.0
        masks[:, 1, :] = 8.0
        conf = np.asarray([[5.0, -5.0, 5.0, -5.0]] * B)
        ids = process_pred_stroke_masks_to_stroke_ids(masks, conf)
        # contiguous ids from 0; two strokes
        assert set(np.unique(ids[0])) == {0.0, 1.0}
        np.testing.assert_array_equal(ids[0][:5], 0.0)
        np.testing.assert_array_equal(ids[0][5:], 1.0)

    def test_end_of_sequence(self):
        from maskplanner_tpu.postprocess.stroke_ids import (
            handle_end_of_sequence)

        seq = np.arange(10)
        out = handle_end_of_sequence(seq, np.asarray(
            [1, 1, 1, -1, 1, 1, 1, 1, 1, 1], float), threshold=0.0)
        np.testing.assert_array_equal(out, seq[:3])
        out = handle_end_of_sequence(seq, np.ones(10), threshold=0.0)
        np.testing.assert_array_equal(out, seq)


class TestSegmentConcat:
    def test_orders_shuffled_segments(self):
        from maskplanner_tpu.postprocess.concat import (
            concat_segments_of_stroke)

        traj = make_stroke_segments(n_seg=15)
        rng = np.random.default_rng(1)
        perm = rng.permutation(15)
        ordered = concat_segments_of_stroke(traj[perm], None, cfg())
        # the recovered order is the original (or its reverse)
        assert ordered.shape[0] >= 13  # few drops tolerated
        starts = ordered[:, :3]
        gaps = np.linalg.norm(np.diff(starts, axis=0), axis=-1)
        # consecutive recovered segments are adjacent on the curve
        assert np.max(gaps) < 0.45

    def test_native_matches_networkx(self, monkeypatch):
        from maskplanner_tpu.postprocess import concat, native

        traj = make_stroke_segments(n_seg=12, seed=3)
        perm = np.random.default_rng(4).permutation(12)
        got_native = concat.concat_segments_of_stroke(traj[perm], None, cfg())
        monkeypatch.setattr(native, "available", lambda: False)
        got_nx = concat.concat_segments_of_stroke(traj[perm], None, cfg())
        np.testing.assert_allclose(got_native, got_nx)


class TestFiltering:
    def test_duplicates_removed(self):
        from maskplanner_tpu.postprocess.segments import (
            filter_overlapping_segments)

        traj = make_stroke_segments(n_seg=10)[None]  # (1, 10, 24)
        traj = np.concatenate([traj, traj[:, :3] + 0.001], axis=1)  # 3 dups
        ids = np.zeros((1, 13), np.int64)
        out_traj, out_ids = filter_overlapping_segments(traj, ids)
        n_removed = int((out_ids[0] == -1).sum())
        assert n_removed == 3
        assert np.all(out_traj[0][out_ids[0] == -1] == -100.0)

    def test_native_matches_python(self, monkeypatch):
        from maskplanner_tpu.postprocess import native
        from maskplanner_tpu.postprocess import segments as seg_mod

        rng = np.random.default_rng(5)
        traj = rng.normal(size=(1, 30, 24))
        traj[0, 11] = traj[0, 4] + 0.01
        traj[0, 21] = traj[0, 4] + 0.02
        ids = np.zeros((1, 30), np.int64)
        got_nat = seg_mod.filter_overlapping_segments(traj, ids)
        monkeypatch.setattr(native, "filter_near_duplicates",
                            lambda *a: None)
        got_py = seg_mod.filter_overlapping_segments(traj, ids)
        np.testing.assert_allclose(got_nat[0], got_py[0])
        np.testing.assert_array_equal(got_nat[1], got_py[1])


class TestResample:
    def test_spacing_and_endpoints(self):
        from maskplanner_tpu.postprocess.segments import (
            resample_at_equal_spaced_points_except_last)

        ts = np.linspace(0, 2.0, 40)
        stroke = np.stack([np.cos(ts), np.sin(ts), ts], axis=-1)
        out = resample_at_equal_spaced_points_except_last(stroke, 0.25)
        np.testing.assert_allclose(out[0], stroke[0])
        np.testing.assert_allclose(out[-1], stroke[-1])
        gaps = np.linalg.norm(np.diff(out[:-1], axis=0), axis=-1)
        assert np.all(gaps > 0.25)  # strictly-greater walk
        assert np.all(gaps < 0.40)  # but near-equally spaced

    def test_native_matches_python(self, monkeypatch):
        from maskplanner_tpu.postprocess import native
        from maskplanner_tpu.postprocess import segments as seg_mod

        ts = np.linspace(0, 3.0, 55)
        stroke = np.stack([np.cos(2 * ts), np.sin(ts), 0.3 * ts], axis=-1)
        got_nat = seg_mod.resample_at_equal_spaced_points_except_last(
            stroke, 0.1)
        monkeypatch.setattr(native, "greedy_spaced_select", lambda *a: None)
        got_py = seg_mod.resample_at_equal_spaced_points_except_last(
            stroke, 0.1)
        np.testing.assert_allclose(got_nat, got_py)


class TestSmoothing:
    def test_gaussian_axiswise_equals_per_dim(self):
        from scipy.ndimage import gaussian_filter1d

        from maskplanner_tpu.postprocess.segments import (
            apply_filter_to_each_dim)

        rng = np.random.default_rng(6)
        sig = rng.normal(size=(50, 6))
        got = apply_filter_to_each_dim(sig, kind="gaussian", sigma=2)
        ref = sig.copy()
        for d in range(6):
            ref[:, d] = gaussian_filter1d(ref[:, d], sigma=2)
        np.testing.assert_allclose(got, ref, rtol=1e-12)


class TestFullPipeline:
    def test_process_stroke_segments(self):
        from maskplanner_tpu.postprocess.segments import (
            process_stroke_segments)

        # two strokes per object
        s0 = make_stroke_segments(n_seg=12, seed=0)
        s1 = make_stroke_segments(n_seg=12, seed=1) + 2.0
        traj = np.concatenate([s0, s1], axis=0)[None]
        ids = np.concatenate([np.zeros(12), np.ones(12)])[None].astype(int)
        out_trajs, out_ids = process_stroke_segments(traj, ids, cfg())
        assert len(out_trajs) == 1
        pts, pids = out_trajs[0], out_ids[0]
        assert pts.shape[1] == 6
        assert set(np.unique(pids)) <= {0.0, 1.0}
        # both strokes survived and are densely sampled
        assert (pids == 0).sum() > 30 and (pids == 1).sum() > 30
        # smooth: no large jumps within a stroke
        for sid in (0, 1):
            p = pts[pids == sid][:, :3]
            assert np.max(np.linalg.norm(np.diff(p, axis=0), axis=-1)) < 0.5


class TestCoverAll:
    """Round-5 coverage fix: off-Edmonds-path segments become sub-strokes
    instead of being silently dropped (reference drop behavior:
    utils/cluster.py:83-89; root cause record: docs/floor_rootcause.md)."""

    def _two_disjoint_chains_one_id(self):
        # one stroke id covering TWO disjoint chains: the Edmonds longest
        # path can only execute one of them
        s0 = make_stroke_segments(n_seg=10, seed=0)
        s1 = make_stroke_segments(n_seg=10, seed=1) + 5.0  # far away
        traj = np.concatenate([s0, s1], axis=0)[None]
        ids = np.zeros((1, 20), dtype=int)
        return traj, ids

    def test_split_offpath_reids_leftovers(self):
        from maskplanner_tpu.postprocess.segments import (
            split_offpath_strokes)

        traj, ids = self._two_disjoint_chains_one_id()
        new_ids = split_offpath_strokes(traj[0], ids[0], cfg())
        assert (new_ids >= 0).all()
        assert len(np.unique(new_ids)) >= 2  # leftovers got fresh ids

    def test_cover_all_keeps_both_chains(self):
        from maskplanner_tpu.postprocess.segments import (
            process_stroke_segments)

        traj, ids = self._two_disjoint_chains_one_id()
        ref_trajs, _ = process_stroke_segments(
            traj.copy(), ids.copy(), cfg(), skip_segments_filtering=True)
        all_trajs, _ = process_stroke_segments(
            traj.copy(), ids.copy(), cfg(), skip_segments_filtering=True,
            cover_all=True)
        # reference drop behavior loses a whole chain; cover_all paints
        # points near BOTH chains
        far = all_trajs[0][:, :3]
        assert (np.linalg.norm(far - far.mean(0), axis=-1) > 2.0).any()
        assert all_trajs[0].shape[0] > 1.7 * ref_trajs[0].shape[0]


class TestAlignment:
    def test_pred_ids_renamed_to_gt(self):
        from maskplanner_tpu.postprocess.align import (
            permute_and_align_stroke_ids_for_visualization)

        gt = np.concatenate([make_stroke_segments(12, seed=0),
                             make_stroke_segments(12, seed=1) + 2.0])[None]
        gt_ids = np.concatenate([np.full(12, 3), np.full(12, 7)])[None]
        # predictions = noisy GT with swapped id labels
        pred = gt + np.random.default_rng(2).normal(0, 0.01, gt.shape)
        pred_ids = np.concatenate([np.full(12, 1), np.full(12, 0)])[None]
        out = permute_and_align_stroke_ids_for_visualization(
            pred.astype(np.float32), pred_ids, gt.astype(np.float32),
            gt_ids, cfg())
        np.testing.assert_array_equal(out[0][:12], 3)
        np.testing.assert_array_equal(out[0][12:], 7)


class TestStrokewisePostprocess:
    def test_confidence_truncation(self):
        """Strokes below confidence drop; each kept stroke truncates at its
        first low-confidence point (reference postprocessing.py:705-756)."""
        from maskplanner_tpu.postprocess.strokewise import (
            postprocess_strokewise_predictions_into_strokes,
            from_strokewise_to_pointwise)

        cfg = {"extra_data": ["orientnorm"]}   # outdim 6
        B, NS, P, D = 1, 3, 4, 6
        strokes = np.arange(B * NS * P * D, dtype=np.float32).reshape(
            B, NS, P * D)
        big, small = 5.0, -5.0  # sigmoid ~1 / ~0
        point_scores = np.full((B, NS, P), big, np.float32)
        point_scores[0, 0, 2:] = small        # stroke 0: length 2
        stroke_scores = np.array([[big, small, big]], np.float32)

        out = postprocess_strokewise_predictions_into_strokes(
            strokes, point_scores, stroke_scores, cfg)
        assert len(out) == 1 and out[0].shape == (2, P * D)
        s0 = out[0][0].reshape(P, D)
        assert not np.any(s0[:2] == -100) and np.all(s0[2:] == -100)
        s1 = out[0][1].reshape(P, D)          # all-confident: full length
        assert not np.any(s1 == -100)

        pts, ids = from_strokewise_to_pointwise(out[0], cfg)
        assert pts.shape == (2 + P, D)
        np.testing.assert_array_equal(ids, [0, 0, 1, 1, 1, 1])

    def test_remove_padding_from_tensors(self):
        from maskplanner_tpu.postprocess.strokewise import (
            remove_padding_from_tensors)

        t = np.array([[1.0, 2.0], [-100.0, -100.0], [3.0, -100.0]])
        out = remove_padding_from_tensors(t)
        np.testing.assert_array_equal(out, [[1.0, 2.0], [3.0, -100.0]])

    def test_select_top_bboxes(self):
        from maskplanner_tpu.postprocess.sop import select_top_bboxes

        boxes = np.array([[0.0, 0.0], [0.01, 0.0], [1.0, 1.0],
                          [1.005, 1.0]], np.float32)
        (kept,) = select_top_bboxes([boxes], threshold=0.05)
        np.testing.assert_array_equal(kept, boxes[[0, 2]])


class TestVizExtensions:
    def test_animated_gif(self, tmp_path, rng):
        from maskplanner_tpu.viz.render import visualize_mesh_traj_animated

        pc = rng.normal(size=(50, 3)).astype(np.float32)
        traj = rng.normal(size=(30, 6)).astype(np.float32)
        ids = np.repeat([0, 1, 2], 10)
        out = tmp_path / "anim.gif"
        visualize_mesh_traj_animated(pc, traj, ids, str(out), n_frames=4)
        assert out.exists() and out.stat().st_size > 0

    def test_latent_segments_plot(self, tmp_path, rng):
        from maskplanner_tpu.viz.render import (
            visualize_latent_segments, visualize_latent_segments_batch)

        lat = rng.normal(size=(2, 24, 16)).astype(np.float32)
        sids = np.repeat(np.arange(4), 6)[None].repeat(2, axis=0)
        f1 = tmp_path / "lat.png"
        visualize_latent_segments(lat[:1], sids[:1], save_path=str(f1))
        assert f1.exists()
        f2 = tmp_path / "lat_batch.png"
        visualize_latent_segments_batch(lat, sids, save_path=str(f2))
        assert f2.exists()


class TestSmallUtilities:
    def test_from_stroke_ids_to_masks_roundtrip(self):
        from maskplanner_tpu.postprocess import from_stroke_ids_to_masks

        ids = np.array([0, 0, 2, 1, -1, 2, 1])
        masks = from_stroke_ids_to_masks(ids)
        assert masks.shape == (3, 7)
        # mutually exclusive over valid entries, padding in no mask
        np.testing.assert_array_equal(masks.sum(axis=0),
                                      [1, 1, 1, 1, 0, 1, 1])
        np.testing.assert_array_equal(masks[2], [0, 0, 1, 0, 0, 1, 0])

    def test_compute_total_path_length(self):
        from maskplanner_tpu.postprocess import compute_total_path_length

        pts = np.array([[0, 0, 0, 9, 9, 9], [3, 4, 0, 1, 1, 1],
                        [3, 4, 12, 0, 0, 0]], float)
        # 5 + 12; orientation columns ignored
        assert abs(compute_total_path_length(pts) - 17.0) < 1e-9
        assert compute_total_path_length(pts[:1]) == 0.0


class TestVizHelpers:
    """Smoke tests: every reference visualize.py helper equivalent renders
    to a PNG without error (matplotlib Agg, reference
    utils/visualize.py:42-511,526-586)."""

    def test_helper_family_renders(self, rng, tmp_path):
        import matplotlib.pyplot as plt

        from maskplanner_tpu.viz import (
            visualize_pc, visualize_sops, visualize_box, visualize_boxes,
            visualize_sequence_traj, visualize_centroid_traj,
            visualize_complete_traj, visualize_complete_traj_tour,
            visualize_mesh_traj_multiangle)

        pc = rng.normal(size=(200, 3)).astype(np.float32)
        traj = rng.normal(size=(40, 6)).astype(np.float32)
        ids = np.repeat(np.arange(4), 10)
        sops = rng.normal(size=(4, 6)).astype(np.float32)
        sops[3] = -100.0  # padding token is skipped
        boxes = np.array([[0, 1, 0, 2, 0, 3], [-100] * 6], float)

        fig = plt.figure()
        ax = fig.add_subplot(111, projection="3d")
        visualize_pc(ax, pc)
        visualize_sops(ax, sops, confidences=[0.9, 0.5, 1.0, 0.2])
        visualize_box(ax, boxes[0])
        visualize_boxes(ax, boxes)
        visualize_sequence_traj(ax, traj)
        visualize_centroid_traj(ax, traj.reshape(10, 24), lambda_points=4)
        visualize_complete_traj(ax, traj, ids)
        visualize_complete_traj_tour(ax, traj, ids,
                                     tour=np.arange(39, -1, -1))
        out = tmp_path / "helpers.png"
        fig.savefig(out)
        plt.close(fig)
        assert out.stat().st_size > 0

        p = visualize_mesh_traj_multiangle(
            pc, traj, ids, save_path=str(tmp_path / "multi.png"),
            title="multi")
        assert (tmp_path / "multi.png").stat().st_size > 0


class TestFusedWholeItemPostprocess:
    """native.process_strokes_item — the single-call whole-item tail must
    be bit-identical to the per-stroke loop (which is itself parity-tested
    against the reference in test_reference_parity_postprocess)."""

    def _synthetic(self, seed=0, B=2, n_seg=60, masks=7, lam=4):
        rng = np.random.default_rng(seed)
        centers = rng.normal(0, 0.5, (masks, 3))
        traj = np.zeros((B, n_seg, lam * 6))
        ids = np.zeros((B, n_seg), np.int64)
        for b in range(B):
            for s in range(n_seg):
                m = s % masks
                base = centers[m] + rng.normal(0, 0.05, 3)
                seg = (base[None, :]
                       + np.linspace(0, 0.03, lam)[:, None]
                       * rng.normal(0, 1, 3))
                o = rng.normal(0, 1, (lam, 3))
                o /= np.linalg.norm(o, axis=-1, keepdims=True)
                traj[b, s] = np.concatenate([seg, o], axis=1).reshape(-1)
                ids[b, s] = m if rng.random() > 0.1 else -1
        return traj, ids

    @pytest.mark.parametrize("no_interp", [False, True])
    def test_fused_matches_loop(self, no_interp):
        from maskplanner_tpu.postprocess import native
        from maskplanner_tpu.postprocess import segments as S
        from maskplanner_tpu.utils.args import load_args

        if not native.available():
            pytest.skip("native library unavailable")
        config = load_args(argv=["config=[maskplanner,cuboids_v2,longx_v2]"])
        traj, ids = self._synthetic()
        t1, i1 = S.process_stroke_segments(
            traj.copy(), ids.copy(), config, skip_segments_filtering=True,
            no_interpolation=no_interp)
        orig = native.process_strokes_item
        native.process_strokes_item = lambda *a, **k: None
        try:
            t2, i2 = S.process_stroke_segments(
                traj.copy(), ids.copy(), config,
                skip_segments_filtering=True, no_interpolation=no_interp)
        finally:
            native.process_strokes_item = orig
        for b in range(len(t1)):
            np.testing.assert_array_equal(t1[b], t2[b])
            np.testing.assert_array_equal(i1[b], i2[b])

    def test_fused_empty_item(self):
        from maskplanner_tpu.postprocess import native
        from maskplanner_tpu.postprocess import segments as S
        from maskplanner_tpu.utils.args import load_args

        if not native.available():
            pytest.skip("native library unavailable")
        config = load_args(argv=["config=[maskplanner,cuboids_v2,longx_v2]"])
        traj = np.full((1, 8, 24), -100.0)
        ids = np.full((1, 8), -1, np.int64)
        t, i = S.process_stroke_segments(traj, ids, config,
                                         skip_segments_filtering=True)
        assert t[0].shape == (0, 6) and i[0].shape == (0,)
