"""Dataset pipeline, geometry preprocessing and config-system tests."""
import numpy as np
import pytest

from maskplanner_tpu.data.pointcloud import (
    add_padding,
    from_pc_to_seq,
    from_seq_to_pc,
    get_dim_traj_points,
    get_sequences_of_lambda_points,
    padding_to_mask,
    remove_padding,
    resample_strokes_at_equal_spaced_points,
    subsample_at_equal_spaced_points,
)
from maskplanner_tpu.data.dataset import PaintDataset, DataLoader, segment_budget
from maskplanner_tpu.data.synthetic import generate_sample
from maskplanner_tpu.data import extras
from maskplanner_tpu.utils.args import load_args


def small_config(**over):
    argv = ["config=[maskplanner,cuboids_v2,longx_v2,debug]",
            "pc_points=128", "n_pred_traj_points=160", "dataset_size=2"]
    argv += [f"{k}={v}" for k, v in over.items()]
    return load_args(argv=argv)


class TestGeometry:
    def test_lambda_segmentation_roundtrip(self, rng):
        # 2 strokes of 12 and 8 points, lambda=4 overlap=0
        traj = rng.normal(size=(20, 6)).astype(np.float64)
        ids = np.array([0] * 12 + [1] * 8)
        segs, seg_ids = get_sequences_of_lambda_points(
            traj, ids, 4, overlapping=0, extra_data=["orientnorm"],
            padding=False)
        assert segs.shape == (5, 24)  # 3 + 2 segments
        assert seg_ids.tolist() == [0, 0, 0, 1, 1]

    def test_overlapping_windows(self, rng):
        traj = rng.normal(size=(10, 6))
        ids = np.zeros(10, dtype=int)
        segs, _ = get_sequences_of_lambda_points(
            traj, ids, 4, overlapping=1, extra_data=["orientnorm"],
            padding=False)
        # (10-4)//3+1 = 3 windows, stride 3
        assert segs.shape == (3, 24)
        np.testing.assert_array_equal(segs[1].reshape(4, 6), traj[3:7])

    def test_short_strokes_dropped(self, rng, capsys):
        traj = rng.normal(size=(14, 6))
        ids = np.array([0] * 12 + [1] * 2)  # stroke 1 shorter than lambda
        segs, seg_ids = get_sequences_of_lambda_points(
            traj, ids, 4, overlapping=0, extra_data=["orientnorm"],
            padding=False)
        assert (seg_ids == 1).sum() == 0
        assert "Skipped 1 strokes" in capsys.readouterr().out

    def test_padding_mask_roundtrip(self, rng):
        traj = rng.normal(size=(5, 24))
        padded = add_padding(traj, 40, 4, 1)
        assert padded.shape[0] == (40 - 4) // 3 + 1
        mask = padding_to_mask(padded)
        assert mask.sum() == 5

    def test_pc_seq_roundtrip(self, rng):
        pts = rng.normal(size=(16, 6))
        seq = from_pc_to_seq(pts, 16, 4, 0, ["orientnorm"], padding=False)
        back = from_seq_to_pc(seq, ["orientnorm"])
        np.testing.assert_allclose(back, pts)

    def test_equal_spacing_subsample(self, rng):
        t = np.linspace(0, 1, 100)[:, None] * np.ones((1, 6))
        ids = np.zeros(100, dtype=int)
        res, rids = resample_strokes_at_equal_spaced_points(
            t, ids, distance=0.1, interpolate=False)
        d = np.linalg.norm(np.diff(res, axis=0), axis=1)
        assert (d > 0.1).all()


class TestSynthetic:
    def test_deterministic(self):
        a = generate_sample("cuboids-v2", 3, pc_points=64)
        b = generate_sample("cuboids-v2", 3, pc_points=64)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_many_stroke_categories_generate(self):
        """shelves/containers presets draw more stroke groups than a box
        has faces (n_faces up to 10); face selection must revisit faces
        for the excess instead of raising (regression: replace=False
        choice of >6 from 6 crashed ~half the shelves seeds)."""
        for cat in ("shelves-v2", "containers-v2"):
            for i in range(40):
                pc, traj, ids = generate_sample(cat, i, pc_points=64)
                assert len(np.unique(ids)) >= 1

    def test_contract(self):
        pc, traj, ids = generate_sample("windows-v2", 0, pc_points=128)
        assert pc.shape == (128, 3)
        assert traj.shape[-1] == 6
        assert ids.shape[0] == traj.shape[0]
        # orientations are unit inward normals
        np.testing.assert_allclose(
            np.linalg.norm(traj[:, 3:], axis=1), 1.0, atol=1e-6)
        assert (np.diff(ids) >= 0).all()  # contiguous ordered stroke ids


class TestDataset:
    def test_static_shapes_and_masks(self):
        cfg = small_config()
        ds = PaintDataset(cfg, split="train", size=2)
        item = ds[0]
        S = segment_budget(cfg)
        assert item["traj"].shape == (S, 24)
        assert item["stroke_ids"].shape == (S,)
        assert item["traj_as_pc"].shape == (160, 6)
        assert item["stroke_masks"].shape == (cfg.max_n_strokes, S)
        valid = item["stroke_ids"] >= 0
        assert not np.any(item["traj"][valid] == -100.0)
        assert np.all(item["traj"][~valid] == -100.0)
        # stroke masks partition valid segments
        np.testing.assert_array_equal(
            item["stroke_masks"].sum(0)[valid], 1.0)

    def test_loader_shuffles_deterministically(self):
        cfg = small_config(dataset_size=4, batch_size=2)
        ds = PaintDataset(cfg, split="train", size=4)
        loader = DataLoader(ds, 2, seed=7)
        b1 = [b["n_strokes"].tolist() for b in loader.epoch(0)]
        b2 = [b["n_strokes"].tolist() for b in loader.epoch(0)]
        assert b1 == b2

    def test_extras_prototypes(self):
        cfg = small_config()
        cfg["load_extra_data"] = ["stroke_masks", "stroke_prototypes",
                                  "segments_per_stroke"]
        cfg["start_of_path_token_length"] = 4
        ds = PaintDataset(cfg, split="train", size=2)
        item = ds[0]
        assert item["stroke_prototypes"].shape == (cfg.max_n_strokes, 24)
        assert item["segments_per_stroke"].shape[0] == cfg.max_n_strokes
        assert item["stroke_valid"].sum() == item["n_strokes"]


class TestExtras:
    def test_general_noise_augmentation(self):
        """general_noise perturbs teacher-forcing histories but keeps unit
        orientations (reference paintnet_ODv1.py:429-448)."""
        cfg = small_config()
        cfg["load_extra_data"] = ["history_of_segments_per_stroke_v2"]
        cfg["substroke_points"] = 3
        cfg["sample_substroke_v2"] = True
        cfg["trasl_noise_stdev"] = 0.05
        cfg["orient_noise_stdev"] = 0.05
        clean = PaintDataset(cfg, split="train", size=2)[0]
        cfg["augmentations"] = ["general_noise"]
        noisy = PaintDataset(cfg, split="train", size=2)[0]
        h_clean = clean["strokewise_history_batch"]
        h_noisy = noisy["strokewise_history_batch"]
        assert h_clean.shape == h_noisy.shape
        assert not np.allclose(h_clean, h_noisy)
        # orientation channels renormalized to weight_orient for non-empty rows
        lam, outdim = int(cfg["lambda_points"]), 6
        hn = h_noisy.reshape(h_noisy.shape[0], h_noisy.shape[1], lam, outdim)
        norms = np.linalg.norm(hn[..., 3:], axis=-1)
        nonzero = norms > 1e-6
        np.testing.assert_allclose(norms[nonzero],
                                   float(cfg["weight_orient"]), rtol=1e-5)

    def test_history_v2(self, rng):
        strokes = [rng.normal(size=(5, 8)), rng.normal(size=(3, 8))]
        hist, tgt, pid, eop = extras.history_batches_v2(strokes, [0, 1], K=2)
        assert hist.shape == (8, 2, 8)
        assert eop.sum() == 2  # one end per stroke
        np.testing.assert_array_equal(hist[0], np.zeros((2, 8)))  # first has empty history
        np.testing.assert_array_equal(tgt[0], strokes[0][0])
        np.testing.assert_array_equal(hist[2][1], strokes[0][1])


class TestBBoxHelpers:
    def test_bbox_encoding_roundtrip(self, rng):
        from maskplanner_tpu.data.pointcloud import (
            get_3dbbox, get_center_of_3dbbox, get_sizes_of_3dbbox,
            from_bbox_encoding_to_visual_format, center_traj)

        stroke = rng.normal(size=(20, 6)).astype(np.float32)
        box = get_3dbbox(stroke)
        center = get_center_of_3dbbox(box)
        sizes = get_sizes_of_3dbbox(box)
        back = from_bbox_encoding_to_visual_format(
            np.concatenate([center, sizes]))
        np.testing.assert_allclose(back, box, rtol=1e-6, atol=1e-7)

        t = stroke.copy()
        c = np.array([1.0, -2.0, 3.0], np.float32)
        out = center_traj(t, c)
        np.testing.assert_allclose(out[:, :3], stroke[:, :3] - c, rtol=1e-6)
        np.testing.assert_allclose(out[:, 3:], stroke[:, 3:])

    def test_mesh_centroid_and_scale(self, tmp_path):
        from maskplanner_tpu.data.io import get_mean_mesh, get_max_distance

        p = tmp_path / "m.obj"
        p.write_text("v 0 0 0\nv 2 0 0\nv 0 2 0\nv 0 0 2\n"
                     "f 1 2 3\nf 1 2 4\nf 1 3 4\nf 2 3 4\n")
        c = get_mean_mesh(str(p))
        np.testing.assert_allclose(c, [0.5, 0.5, 0.5])
        d = get_max_distance(str(p))
        expected = np.sqrt(1.5**2 + 0.5**2 + 0.5**2)
        np.testing.assert_allclose(d, expected, rtol=1e-6)
