"""Metrics parity vs the reference's own code (rounds out the §7 parity
harness): the vendored-torchmetrics clustering internals
(reference ``utils/metrics/``), the SoP threshold-sweep metrics
(``metrics_handler.py:334-433``), and ``chamfer_original``
(``metrics_handler.py:265-282``).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from ref_harness import REFERENCE, import_reference, install_stubs  # noqa: E402

ref = import_reference()

import torch  # noqa: E402

from maskplanner_tpu.metrics import MetricsHandler as MPMetricsHandler  # noqa: E402
from maskplanner_tpu.metrics.clustering import (  # noqa: E402
    completeness_score,
    homogeneity_completeness_v_measure,
    mutual_info_score,
    v_measure_score,
)
from maskplanner_tpu.postprocess.sop import (  # noqa: E402
    postprocess_sop_predictions,
)

DictConfig = sys.modules["omegaconf"].DictConfig


@pytest.fixture
def rng():
    return np.random.default_rng(20260817)


def _import_ref_vendored_metrics():
    """Import the reference's vendored torchmetrics clustering package."""
    import types

    install_stubs()
    if "torchmetrics" not in sys.modules:
        # the vendored package only needs ``_check_same_shape``
        tm = types.ModuleType("torchmetrics")
        util = types.ModuleType("torchmetrics.utilities")
        checks = types.ModuleType("torchmetrics.utilities.checks")

        def _check_same_shape(preds, target):
            if preds.shape != target.shape:
                raise RuntimeError(
                    f"shape mismatch: {preds.shape} vs {target.shape}")

        checks._check_same_shape = _check_same_shape
        util.checks = checks
        tm.utilities = util
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.utilities"] = util
        sys.modules["torchmetrics.utilities.checks"] = checks
    sys.dont_write_bytecode = True
    added = REFERENCE not in sys.path
    if added:
        sys.path.insert(0, REFERENCE)
    try:
        from utils import metrics as ref_metrics
    finally:
        if added and REFERENCE in sys.path:
            sys.path.remove(REFERENCE)
    return ref_metrics


refm = _import_ref_vendored_metrics()


# ---------------------------------------------------------------------------
# vendored torchmetrics clustering internals
# ---------------------------------------------------------------------------

def _label_cases(rng):
    n = 60
    yield (rng.integers(0, 5, n), rng.integers(0, 7, n))     # generic
    a = rng.integers(0, 4, n)
    yield (a, a.copy())                                      # perfect match
    yield (a, (a + 1) % 4)                                   # permuted (equiv)
    yield (np.zeros(n, np.int64), rng.integers(0, 3, n))     # single GT cluster
    yield (rng.integers(0, 3, n), np.zeros(n, np.int64))     # single pred
    yield (np.arange(n), rng.integers(0, 2, n))              # all-singleton GT


def test_v_measure_parity(rng):
    for t, p in _label_cases(rng):
        rv = float(refm.v_measure_score(torch.from_numpy(np.asarray(p)),
                                        torch.from_numpy(np.asarray(t))))
        mv = float(v_measure_score(t, p))
        assert np.isclose(rv, mv, rtol=1e-6, atol=1e-7), (t[:8], p[:8])


def test_mutual_info_parity(rng):
    for t, p in _label_cases(rng):
        rv = float(refm.mutual_info_score(torch.from_numpy(np.asarray(p)),
                                          torch.from_numpy(np.asarray(t))))
        mv = float(mutual_info_score(t, p))
        assert np.isclose(rv, mv, rtol=1e-6, atol=1e-7)


def test_homogeneity_completeness_parity(rng):
    for t, p in _label_cases(rng):
        rh = float(refm.homogeneity_score(torch.from_numpy(np.asarray(p)),
                                          torch.from_numpy(np.asarray(t))))
        rc = float(refm.completeness_score(torch.from_numpy(np.asarray(p)),
                                           torch.from_numpy(np.asarray(t))))
        mh, mc, _ = homogeneity_completeness_v_measure(t, p)
        assert np.isclose(rh, float(mh), rtol=1e-6, atol=1e-7)
        assert np.isclose(rc, float(mc), rtol=1e-6, atol=1e-7)
        assert np.isclose(float(completeness_score(t, p)), rc,
                          rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# SoP metrics (threshold sensitivity sweeps)
# ---------------------------------------------------------------------------

def _sop_fixture(rng, B=4, S=12, D=3):
    sop_pred = rng.normal(size=(B, S, D)).astype(np.float32)
    conf = rng.normal(scale=2.0, size=(B, S)).astype(np.float32)
    conf[:, 0] = 4.0  # at least one confident SoP per sample
    sop_gt = np.full((B, S, D), -100.0, np.float32)
    for b in range(B):
        n = int(rng.integers(1, S))
        sop_gt[b, :n] = rng.normal(size=(n, D))
    return sop_pred, conf, sop_gt


@pytest.mark.parametrize("which", ["sop_metrics", "sop_metrics_v2"])
def test_sop_metrics_parity(rng, which):
    sop_pred, conf, sop_gt = _sop_fixture(rng)
    thr = 0.5

    ref_cfg = DictConfig(dict(extra_data=[], lambda_points=1))
    ref_h = ref.metrics_handler.MetricsHandler(config=ref_cfg,
                                               metrics=[which])
    t_pred = torch.from_numpy(sop_pred)
    t_conf = torch.from_numpy(conf)
    processed_t = ref.postprocessing.postprocess_sop_predictions(
        sop_pred=t_pred, pred_sop_conf_scores=t_conf,
        sop_conf_threshold=thr)
    getter = (ref_h.get_sop_metrics if which == "sop_metrics"
              else ref_h.get_sop_metrics_v2)
    ref_vals = getter(sop_pred=t_pred, processed_sop_pred=processed_t,
                      sop_gt=torch.from_numpy(sop_gt),
                      pred_sop_conf_scores=t_conf, sop_conf_threshold=thr)

    mp_cfg = dict(extra_data=(), lambda_points=1)
    mp_h = MPMetricsHandler(mp_cfg, metrics=[which])
    processed_m = postprocess_sop_predictions(sop_pred, conf, thr)
    # same retained sets first (the sweep re-filters internally)
    for pm, pt in zip(processed_m, processed_t):
        assert len(pm) == len(pt)
    getter_m = (mp_h.get_sop_metrics if which == "sop_metrics"
                else mp_h.get_sop_metrics_v2)
    mp_vals = getter_m(sop_pred=sop_pred, processed_sop_pred=processed_m,
                       sop_gt=sop_gt, pred_sop_conf_scores=conf,
                       sop_conf_threshold=thr)
    np.testing.assert_allclose(np.asarray(mp_vals, float),
                               np.asarray(ref_vals, float), rtol=1e-6)


# ---------------------------------------------------------------------------
# chamfer_original
# ---------------------------------------------------------------------------

def test_chamfer_original_parity(rng):
    B, S, lam, outdim = 2, 25, 4, 3
    y_pred = rng.normal(size=(B, S, lam * outdim)).astype(np.float32)
    traj_pc = rng.normal(size=(B, 140, outdim)).astype(np.float32)

    ref_cfg = DictConfig(dict(extra_data=[], lambda_points=lam))
    ref_h = ref.metrics_handler.MetricsHandler(config=ref_cfg,
                                               metrics=["chamfer_original"])
    ref_val = ref_h.get_chamfer_original(
        y_pred=torch.from_numpy(y_pred), y=None,
        traj_pc=torch.from_numpy(traj_pc))

    mp_h = MPMetricsHandler(dict(extra_data=(), lambda_points=lam),
                            metrics=["chamfer_original"])
    mp_val = mp_h.get_chamfer_original(y_pred=y_pred, traj_pc=traj_pc)
    assert np.isclose(float(ref_val), float(mp_val), rtol=1e-4)
