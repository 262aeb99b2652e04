"""Postprocess + metrics parity vs the reference's own code.

Compares this repo's host-side postprocess pipeline (mask->stroke-ids,
overlapping-segment filtering, Edmonds concat, resample/upsample/smooth)
and the metrics handler against /root/reference's implementations
(utils/postprocessing.py, utils/cluster.py, metrics_handler.py) on seeded
fixtures.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from ref_harness import import_reference  # noqa: E402

ref = import_reference()

import torch  # noqa: E402

from maskplanner_tpu.postprocess.stroke_ids import (  # noqa: E402
    process_pred_stroke_masks_to_stroke_ids as mp_masks_to_ids,
)
from maskplanner_tpu.postprocess.concat import (  # noqa: E402
    concat_segments_of_stroke as mp_concat,
)
from maskplanner_tpu.postprocess.segments import (  # noqa: E402
    process_stroke_segments as mp_process_segments,
)
from maskplanner_tpu.metrics import MetricsHandler as MPMetricsHandler  # noqa: E402

DictConfig = sys.modules["omegaconf"].DictConfig

# orientnorm (outdim=6): the reference's concat slices
# traj[:, -outdim:-(outdim-3)] (utils/cluster.py:42), which is empty for
# outdim=3 — the pipeline is only ever run on pose+normal data.
CONFIG = dict(extra_data=["orientnorm"], lambda_points=4,
              equal_spaced_points_distance=0.05)
OUTDIM = 6


def _config_pair():
    return (DictConfig(dict(CONFIG)),
            {**CONFIG, "extra_data": tuple(CONFIG["extra_data"])})


# ---------------------------------------------------------------------------
# mask -> stroke ids
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("threshold", [0.5, 0.9])
def test_masks_to_stroke_ids_parity(rng, threshold):
    B, M, S = 3, 8, 60
    masks = rng.normal(scale=3.0, size=(B, M, S)).astype(np.float32)
    scores = rng.normal(size=(B, M)).astype(np.float32)
    # ensure at least one mask survives per sample
    scores[:, 0] = 5.0
    ref_ids = ref.postprocessing.process_pred_stroke_masks_to_stroke_ids(
        masks, scores, confidence_threshold=threshold)
    mp_ids = mp_masks_to_ids(masks, scores, confidence_threshold=threshold)
    np.testing.assert_array_equal(mp_ids, np.asarray(ref_ids))


def test_masks_to_stroke_ids_large_logits(rng):
    # overflow hygiene: huge logits must not warn or change the result
    B, M, S = 2, 4, 20
    masks = rng.normal(scale=600.0, size=(B, M, S)).astype(np.float32)
    scores = rng.normal(scale=600.0, size=(B, M)).astype(np.float32)
    scores[:, 0] = 5.0
    with np.errstate(over="raise"):
        mp_ids = mp_masks_to_ids(masks, scores)
    ref_ids = ref.postprocessing.process_pred_stroke_masks_to_stroke_ids(
        masks, scores)
    np.testing.assert_array_equal(mp_ids, np.asarray(ref_ids))


# ---------------------------------------------------------------------------
# segment concat (Edmonds)
# ---------------------------------------------------------------------------

def _snake_segments(rng, n_pts=48, lam=4, shuffle=True, noise=0.0):
    """A smooth pose+normal (outdim=6) curve cut into λ-segments."""
    t = np.linspace(0.0, 3.0, n_pts)
    pos = np.stack([t, np.sin(2 * t) * 0.4, np.cos(3 * t) * 0.2], axis=1)
    nrm = np.stack([np.zeros_like(t), np.cos(2 * t), np.sin(2 * t)], axis=1)
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    pts = np.concatenate([pos, nrm], axis=1)
    if noise:
        pts = pts + noise * rng.normal(size=pts.shape)
    segs = pts.reshape(-1, lam * OUTDIM)
    if shuffle:
        segs = segs[rng.permutation(segs.shape[0])]
    return segs


@pytest.mark.parametrize("shuffle", [False, True])
def test_concat_segments_parity(rng, shuffle):
    segs = _snake_segments(rng, shuffle=shuffle)
    ref_cfg, mp_cfg = _config_pair()
    sids = np.zeros(segs.shape[0])
    ref_out = ref.cluster.concat_segments_of_stroke(
        torch.from_numpy(segs.copy()), sids, ref_cfg)
    mp_out = mp_concat(segs.copy(), sids, mp_cfg)
    np.testing.assert_allclose(mp_out, np.asarray(ref_out), rtol=1e-6)


def test_concat_segments_parity_disconnected(rng):
    # two far-apart snakes in one "stroke": the knn/radius graph is
    # disconnected, exercising the spanning-forest (minimal branching)
    # behavior of the reference's removed Edmonds class
    a = _snake_segments(rng, n_pts=24, shuffle=True)
    b = _snake_segments(rng, n_pts=24, shuffle=True) + 50.0
    segs = np.concatenate([a, b], axis=0)
    ref_cfg, mp_cfg = _config_pair()
    sids = np.zeros(segs.shape[0])
    ref_out = ref.cluster.concat_segments_of_stroke(
        torch.from_numpy(segs.copy()), sids, ref_cfg)
    mp_out = mp_concat(segs.copy(), sids, mp_cfg)
    np.testing.assert_allclose(mp_out, np.asarray(ref_out), rtol=1e-6)


# ---------------------------------------------------------------------------
# full segment postprocess
# ---------------------------------------------------------------------------

def _stroke_batch(rng, B=2, lam=4):
    """Batch of segment sets with stroke ids, including near-duplicate
    segments so the overlap filter has work to do."""
    trajs, ids = [], []
    for b in range(B):
        segs_all, ids_all = [], []
        for sid in range(3):
            segs = _snake_segments(rng, n_pts=32, shuffle=True,
                                   noise=0.003)
            segs = segs + np.array([0, 2.0 * sid, 0, 0, 0, 0] * lam)
            # inject a near-duplicate segment (filter fodder)
            dup = segs[1:2] + 0.01
            segs = np.concatenate([segs, dup], axis=0)
            segs_all.append(segs)
            ids_all.append(np.full(segs.shape[0], sid, dtype=float))
        trajs.append(np.concatenate(segs_all))
        ids.append(np.concatenate(ids_all))
    return np.stack(trajs), np.stack(ids)


@pytest.mark.parametrize("mode", ["filter_only", "full", "no_interpolation",
                                  "fast_concat"])
def test_process_stroke_segments_parity(rng, mode):
    traj, sids = _stroke_batch(rng)
    ref_cfg, mp_cfg = _config_pair()
    kw = dict(
        segments_filtering_only=(mode == "filter_only"),
        no_interpolation=(mode == "no_interpolation"),
        fast_concat=(mode == "fast_concat"),
    )
    ref_t, ref_i = ref.postprocessing.process_stroke_segments(
        traj.copy(), sids.copy(), ref_cfg, **kw)
    mp_t, mp_i = mp_process_segments(traj.copy(), sids.copy(), mp_cfg, **kw)
    if mode == "filter_only":
        np.testing.assert_allclose(mp_t, np.asarray(ref_t), rtol=1e-6)
        np.testing.assert_array_equal(mp_i, np.asarray(ref_i))
    else:
        for b in range(traj.shape[0]):
            np.testing.assert_allclose(
                np.asarray(mp_t[b]), np.asarray(ref_t[b]), rtol=1e-5,
                atol=1e-7, err_msg=f"sample {b} trajectories differ ({mode})")
            np.testing.assert_array_equal(np.asarray(mp_i[b]),
                                          np.asarray(ref_i[b]))


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def _metrics_configs():
    cfg = dict(extra_data=[], lambda_points=4, normalization="per-dataset")
    return DictConfig(cfg), {**cfg, "extra_data": ()}


def test_pcd_metric_parity(rng):
    ref_cfg, mp_cfg = _metrics_configs()
    B, S, lam, outdim = 2, 30, 4, 3
    y_pred = rng.normal(size=(B, S, lam * outdim)).astype(np.float32)
    P = 100
    traj_as_pc = rng.normal(size=(B, P, outdim)).astype(np.float32)
    traj_as_pc[0, 80:] = -100.0
    ref_h = ref.metrics_handler.MetricsHandler(config=ref_cfg, metrics=["pcd"])
    ref_val = ref_h.get_pcd(
        y_pred=torch.from_numpy(y_pred), y=None,
        traj_as_pc=torch.from_numpy(traj_as_pc.copy()))
    mp_h = MPMetricsHandler(mp_cfg, metrics=["pcd"])
    mp_val = mp_h.get_pcd(y_pred=y_pred, traj_as_pc=traj_as_pc)
    assert np.isclose(float(ref_val), float(np.asarray(mp_val).squeeze()),
                      rtol=1e-4)


def test_stroke_masks_metrics_parity(rng):
    ref_cfg, mp_cfg = _metrics_configs()
    B, M, S = 4, 8, 60
    masks = rng.normal(scale=3.0, size=(B, M, S)).astype(np.float32)
    scores = rng.normal(size=(B, M)).astype(np.float32)
    scores[:, 0] = 5.0
    n_strokes = [3, 5, 2, 8]
    ref_h = ref.metrics_handler.MetricsHandler(
        config=ref_cfg, metrics=["stroke_masks_metrics"])
    ref_vals = ref_h.stroke_masks_metrics(
        n_strokes=n_strokes,
        pred_stroke_masks=torch.from_numpy(masks),
        mask_scores=torch.from_numpy(scores))
    mp_h = MPMetricsHandler(mp_cfg, metrics=["stroke_masks_metrics"])
    mp_vals = mp_h.get_stroke_masks_metrics(
        n_strokes=n_strokes, pred_stroke_masks=masks, mask_scores=scores)
    np.testing.assert_allclose(np.asarray(mp_vals, float),
                               np.asarray(ref_vals, float), rtol=1e-6)


def test_strokewise_num_of_strokes_parity(rng):
    ref_cfg, mp_cfg = _metrics_configs()
    n_strokes = [3, 5, 2]
    traj_pred = [torch.zeros((k, 12)) for k in (3, 4, 2)]
    ref_h = ref.metrics_handler.MetricsHandler(
        config=ref_cfg, metrics=["strokewise_num_of_strokes_metrics"])
    ref_vals = ref_h.strokewise_num_of_strokes_metrics(
        n_strokes=n_strokes, traj_pred=traj_pred)
    mp_h = MPMetricsHandler(mp_cfg,
                            metrics=["strokewise_num_of_strokes_metrics"])
    mp_vals = mp_h.get_strokewise_num_of_strokes_metrics(
        n_strokes=n_strokes, traj_pred=[t.numpy() for t in traj_pred])
    np.testing.assert_allclose(np.asarray(mp_vals, float),
                               np.asarray(ref_vals, float), rtol=1e-6)
