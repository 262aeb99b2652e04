"""Loss parity vs the reference LossHandler — round-2 extension.

Covers the loss names `test_reference_parity_losses.py` does not: the
geometric regularizers (align, velcosine, mse, rich attraction), the
stroke-level family (mse_strokes, chamfer_strokes, masked_mse_strokes,
masked_mse_strokes_v2, masked_mse_strokes_from_segments), the
autoregressive next-token losses, SoP Hungarian matching, bbox chamfer,
and the stochastic reverse chamfer in its deterministic regime
(S_pred ≥ S_gt: the random GT subset is the full permuted set and the
chamfer is permutation-invariant).

Excluded, with reasons: `discriminator`/`wdiscriminator` build internal
torch optimizers with CUDA-only RNG paths (loss_handler.py:259-375) and
`contrastive_v1` allocates `torch.cuda.FloatTensor` masks
(loss_handler.py:513-518) — neither runs on CPU torch; both are covered
by convergence studies instead (`scripts/gan_convergence_study.py`).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from ref_harness import import_reference  # noqa: E402

ref = import_reference()

import torch  # noqa: E402

from maskplanner_tpu.losses import LossHandler as MPLossHandler  # noqa: E402

DictConfig = sys.modules["omegaconf"].DictConfig


BASE = dict(
    extra_data=[],
    lambda_points=1,
    stroke_pred=False,
    min_centroids=False,
    per_segment_confidence=False,
    smooth_target_stroke_masks=False,
    soft_attraction=False,
    knn_repulsion=3,
    rep_target=None,
    explicit_weight_endofpath_confidence_loss=0.4,
    explicit_no_sop_weight=0.25,
    explicit_weight_sop_confidence_loss=0.6,
    explicit_no_stroke_weight=0.2,
    explicit_weight_masked_mse_loss=0.9,
    explicit_weight_point_confidence_loss=0.7,
    explicit_weight_stroke_confidence_loss=0.5,
)


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


def _assert_close(loss_names, batch, rtol=1e-4, ref_batch=None, **overrides):
    cfg = dict(BASE)
    for name in loss_names:
        cfg[f"weight_{name}"] = 1.0
    cfg.update(overrides)
    ref_cfg = DictConfig({**cfg, "extra_data": list(cfg["extra_data"])})
    mp_cfg = {**cfg, "extra_data": tuple(cfg["extra_data"])}

    rh = ref.loss_handler.LossHandler(loss_names, config=ref_cfg)
    kw = {}
    # .copy(): torch.from_numpy shares the buffer and several reference
    # losses zero padding rows IN PLACE (e.g. loss_handler.py:1527-1528)
    for k, v in (ref_batch or batch).items():
        if isinstance(v, list):
            kw[k] = [torch.from_numpy(x.copy()) for x in v]
        else:
            kw[k] = torch.from_numpy(v.copy())
    rv, _ = rh.compute(**kw)
    rv = float(rv)

    mh = MPLossHandler(loss_names, mp_cfg)
    import jax.random as jrandom

    mv = float(mh.compute(mh.init_weights(), rng=jrandom.PRNGKey(0),
                          **batch)[0])
    assert np.isclose(rv, mv, rtol=rtol, atol=1e-5), (
        f"{loss_names}: ref={rv} repo={mv}")


# ---------------------------------------------------------------------------
# regularizers / simple terms
# ---------------------------------------------------------------------------

def test_mse(rng):
    y_pred = rng.normal(size=(2, 30, 3)).astype(np.float32)
    y = rng.normal(size=(2, 30, 3)).astype(np.float32)
    _assert_close(["mse"], {"y_pred": y_pred, "y": y})


def test_align(rng):
    y_pred = rng.normal(size=(2, 40, 3)).astype(np.float32)
    _assert_close(["align"], {"y_pred": y_pred})


def test_velcosine(rng):
    y_pred = rng.normal(size=(2, 35, 6)).astype(np.float32)
    _assert_close(["velcosine"], {"y_pred": y_pred},
                  extra_data=["vel"])


def test_rich_attraction_chamfer(rng):
    # outdim=6 (orientnorm): the reference slices poses at [outdim:outdim+3]
    # and [-outdim:-(outdim-3)] for inferred velocities
    y_pred = rng.normal(size=(2, 24, 4 * 6)).astype(np.float32)
    _assert_close(["rich_attraction_chamfer"], {"y_pred": y_pred},
                  extra_data=["orientnorm"], lambda_points=4)


def test_stochastic_reverse_chamfer_deterministic_regime(rng):
    # S_pred >= S_gt and unpadded GT: the reference's randperm subset is the
    # full set; the reverse chamfer is permutation-invariant -> deterministic
    y_pred = rng.normal(size=(2, 50, 12)).astype(np.float32)
    y = rng.normal(size=(2, 30, 12)).astype(np.float32)
    _assert_close(["stoch_reverse_asymm_segment_chamfer"],
                  {"y_pred": y_pred, "y": y}, lambda_points=4)


def test_chamfer_bbox(rng):
    bbox_pred = rng.normal(size=(2, 8, 6)).astype(np.float32)
    bbox_gt = rng.normal(size=(2, 10, 6)).astype(np.float32)
    bbox_gt[0, 7:] = -100.0
    bbox_gt[1, 5:] = -100.0
    batch = {"y_pred": bbox_pred, "y": bbox_gt,
             "bbox_pred": bbox_pred, "bbox_gt": bbox_gt}
    _assert_close(["chamfer_bbox"], batch)


# ---------------------------------------------------------------------------
# stroke-level losses
# ---------------------------------------------------------------------------

def test_mse_strokes(rng):
    pred = rng.normal(size=(7, 60)).astype(np.float32)
    gt = rng.normal(size=(7, 60)).astype(np.float32)
    _assert_close(["mse_strokes"],
                  {"stacked_strokes_pred": pred, "stacked_strokes_gt": gt})


def test_chamfer_strokes(rng):
    pred = rng.normal(size=(5, 12, 24)).astype(np.float32)
    gt = rng.normal(size=(5, 15, 24)).astype(np.float32)
    gt[0, 10:] = -100.0
    gt[2, 7:] = -100.0
    _assert_close(["chamfer_strokes"],
                  {"stacked_segments_per_stroke_pred": pred,
                   "stacked_segments_per_stroke_gt": gt},
                  lambda_points=4)


def test_masked_mse_strokes(rng):
    K, N_gt, N_pred, outdim = 6, 20, 26, 6
    gt = rng.normal(size=(K, N_gt, outdim)).astype(np.float32)
    lens = rng.integers(5, N_gt + 1, size=K)
    for k in range(K):
        gt[k, lens[k]:] = -100.0
    pred = rng.normal(size=(K, N_pred, outdim)).astype(np.float32)
    scores = rng.normal(size=(K, N_pred, 1)).astype(np.float32)
    _assert_close(["masked_mse_strokes"],
                  {"stacked_points_per_stroke_pred": pred,
                   "stacked_points_per_stroke_gt": gt,
                   "confidence_scores": scores},
                  extra_data=["orientnorm"])


def test_masked_mse_strokes_from_segments(rng):
    K, N, outdim = 5, 18, 6
    pred = rng.normal(size=(K, N, outdim)).astype(np.float32)
    gt = rng.normal(size=(K, N, outdim)).astype(np.float32)
    lens = rng.integers(4, N + 1, size=K)
    mask = (np.arange(N)[None, :] < lens[:, None]).astype(np.float32)
    probs = rng.uniform(0.05, 0.95, size=(K, N, 1)).astype(np.float32)
    _assert_close(["masked_mse_strokes_from_segments"],
                  {"stacked_points_per_stroke_pred": pred,
                   "stacked_points_per_stroke_gt": gt,
                   "confidence_scores": probs, "output_mask": mask},
                  extra_data=["orientnorm"])


def test_masked_mse_strokes_v2(rng):
    B, M_pred, M_gt_per = 2, 6, [3, 5]
    n_gt_pts, n_pred_pts, outdim = 9, 12, 6
    pred = rng.normal(size=(B, M_pred, n_pred_pts * outdim)) \
        .astype(np.float32)
    point_scores = rng.normal(size=(B, M_pred, n_pred_pts)) \
        .astype(np.float32)
    stroke_scores = rng.normal(size=(B, M_pred)).astype(np.float32)

    ref_pps, padded, mask = [], np.full(
        (B, max(M_gt_per), n_gt_pts * outdim), -100.0, np.float32), \
        np.zeros((B, max(M_gt_per)), bool)
    for b in range(B):
        strokes = rng.normal(size=(M_gt_per[b], n_gt_pts, outdim)) \
            .astype(np.float32)
        for s in range(M_gt_per[b]):
            cut = rng.integers(4, n_gt_pts + 1)
            strokes[s, cut:] = -100.0
        ref_pps.append(strokes)
        padded[b, : M_gt_per[b]] = strokes.reshape(M_gt_per[b], -1)
        mask[b, : M_gt_per[b]] = True

    batch = {"pred_points_per_stroke": pred,
             "points_per_stroke": padded,
             "pred_point_scores": point_scores,
             "pred_stroke_scores": stroke_scores,
             "gt_stroke_mask": mask}
    ref_batch = dict(batch)
    ref_batch["points_per_stroke"] = ref_pps
    del ref_batch["gt_stroke_mask"]
    _assert_close(["masked_mse_strokes_v2"], batch, ref_batch=ref_batch,
                  extra_data=["orientnorm"])


# ---------------------------------------------------------------------------
# autoregressive next-token
# ---------------------------------------------------------------------------

def test_mse_nexttoken(rng):
    pred = rng.normal(size=(9, 24)).astype(np.float32)
    gt = rng.normal(size=(9, 24)).astype(np.float32)
    _assert_close(["mse_nexttoken"],
                  {"stacked_pred_nexttoken": pred,
                   "stacked_gt_nexttoken": gt}, lambda_points=4)


def test_mse_nexttoken_v2(rng):
    K = 12
    pred = rng.normal(size=(K, 24)).astype(np.float32)
    gt = rng.normal(size=(K, 24)).astype(np.float32)
    scores = rng.normal(size=(K,)).astype(np.float32)
    eop = np.zeros(K, np.float32)
    eop[[3, 9]] = 1.0  # both classes present (reference torch.unique)
    _assert_close(["mse_nexttoken_v2"],
                  {"stacked_pred_nexttoken": pred,
                   "stacked_gt_nexttoken": gt,
                   "end_of_path_scores": scores,
                   "end_of_path_gt": eop}, lambda_points=4)


# ---------------------------------------------------------------------------
# SoP Hungarian
# ---------------------------------------------------------------------------

def test_hungarian_sops(rng):
    B, P, D = 2, 8, 6
    sop_pred = rng.normal(size=(B, P, D)).astype(np.float32)
    sop_gt = np.full((B, P, D), -100.0, np.float32)
    n_gt = [5, 3]
    for b in range(B):
        sop_gt[b, : n_gt[b]] = rng.normal(size=(n_gt[b], D))
    conf = rng.normal(size=(B, P)).astype(np.float32)
    _assert_close(["hungarian_SoPs"],
                  {"sop_pred": sop_pred, "sop_gt": sop_gt,
                   "pred_sop_conf_scores": conf}, lambda_points=4)
