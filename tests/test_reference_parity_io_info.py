"""Model IO-shape parity vs the reference's own `get_io_info`.

The reference factory computes every head size from the config
(models/__init__.py:220-383) — out_vectors, translation/orientation split,
mask counts, rollout input sizing. Run the reference's function and this
repo's `maskplanner_tpu.models.get_io_info` on the same configs (including
all four shipped category configs) and assert the shared keys agree.
"""
import contextlib
import io
import sys

import pytest

sys.path.insert(0, "tests")
from ref_harness import REFERENCE, install_stubs  # noqa: E402

install_stubs()

from maskplanner_tpu.models import get_io_info as mp_io_info  # noqa: E402
from maskplanner_tpu.utils.args import load_args  # noqa: E402
from maskplanner_tpu.utils.config import Config  # noqa: E402

DictConfig = sys.modules["omegaconf"].DictConfig


def _import_ref_models():
    sys.dont_write_bytecode = True
    added = REFERENCE not in sys.path
    if added:
        sys.path.insert(0, REFERENCE)
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            import models as ref_models
    finally:
        if added and REFERENCE in sys.path:
            sys.path.remove(REFERENCE)
    return ref_models


ref_models = _import_ref_models()


def _ref_cfg(d):
    """dict -> attribute-accessible DictConfig (nested one level)."""
    return DictConfig({k: DictConfig(v) if isinstance(v, dict) else v
                       for k, v in d.items()})


def _assert_io_parity(io_type, cfg_dict):
    with contextlib.redirect_stdout(io.StringIO()):
        ref = ref_models.get_io_info(io_type, _ref_cfg(cfg_dict))
    ours = mp_io_info(io_type, Config(cfg_dict))
    for key, val in ref.items():
        assert key in ours, f"{io_type}: missing key {key}"
        assert ours[key] == val, \
            f"{io_type}.{key}: ours={ours[key]} ref={val}"


CATEGORIES = ["cuboids_v2", "windows_v2", "shelves_v2", "containers_v2"]


@pytest.mark.parametrize("category", CATEGORIES)
def test_maskplanner_category_parity(category):
    cfg = load_args(argv=[f"config=[maskplanner,{category}]"])
    _assert_io_parity("MaskPlanner", dict(cfg))


@pytest.mark.parametrize("lam,overlap,traj_points", [(4, 1, 2000), (1, 0, 500),
                                                     (4, 2, 675)])
def test_paintnet_parity(lam, overlap, traj_points):
    cfg = {"extra_data": ["orientnorm"], "lambda_points": lam,
           "overlapping": overlap, "traj_points": traj_points,
           "traj_with_equally_spaced_points": False,
           "n_pred_traj_points": None}
    _assert_io_parity("paintnet", cfg)


def test_strokewise_parity():
    cfg = {"extra_data": ["orientnorm"], "lambda_points": 4,
           "max_n_strokes": 12, "max_n_stroke_points": 100}
    _assert_io_parity("StrokeWise", cfg)


def test_multipathregression_parity():
    cfg = {"extra_data": [], "lambda_points": 1, "stroke_points": 50,
           "n_strokes": 6}
    _assert_io_parity("multipathregression", cfg)


def test_contrastive_parity():
    cfg = {"extra_data": ["orientnorm"], "lambda_points": 4}
    _assert_io_parity("ContrastiveClustering", cfg)


def test_stroke_proposal_parity():
    cfg = {"extra_data": ["orientnorm"], "lambda_points": 4,
           "stroke_prototype_kind": "start_of_path_token",
           "stroke_prototype_dim": 18, "start_of_path_token_length": 3}
    _assert_io_parity("ODv1_strokeProposal", cfg)


@pytest.mark.parametrize("loss,extra", [
    ("mse_strokes", {"stroke_points": 80}),
    ("chamfer_strokes", {"out_segments_per_stroke": 25}),
    ("masked_mse_strokes", {"out_points_per_stroke": 90}),
    ("masked_mse_strokes_from_segments", {"out_points_per_stroke": 90}),
    ("mse_nexttoken", {"substroke_points": 5,
                       "end_of_path_confidence": False}),
    ("mse_nexttoken_v2", {"substroke_points": 5,
                          "end_of_path_confidence": True}),
])
@pytest.mark.parametrize("obj_feats", [False, True])
def test_stroke_rollout_parity(loss, extra, obj_feats):
    cfg = {"extra_data": ["orientnorm"], "lambda_points": 4,
           "stroke_prototype_dim": 6,
           "rollout_model": {"object_features": obj_feats},
           "rollout_loss": [loss], **extra}
    _assert_io_parity("ODv1_strokeRollout", cfg)
