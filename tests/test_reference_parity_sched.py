"""LR-schedule parity vs the exact torch schedulers the reference uses.

The reference builds ``torch.optim.lr_scheduler.StepLR`` / ``MultiStepLR``
(plus the ``step_n_times`` milestone synthesis) and calls ``sched.step()``
once per epoch (reference ``utils/training.py:70-108``,
``train_maskplanner.py:229``). This repo lowers all three to one optax
``piecewise_constant_schedule`` over *step* indices — assert the per-epoch
learning rates match torch's exactly.
"""
import numpy as np
import pytest
import torch

from maskplanner_tpu.train.schedulers import lr_schedule

BASE_LR = 1e-3
EPOCHS = 40
SPE = 3  # steps per epoch


def _torch_lrs(make_sched):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=BASE_LR)
    sched = make_sched(opt)
    lrs = []
    for _ in range(EPOCHS):
        lrs.append(opt.param_groups[0]["lr"])
        sched.step()
    return np.array(lrs)


def _ours_lrs(lr_sched_cfg, epochs=EPOCHS, steps_per_epoch=SPE, steplr=None):
    cfg = {"lr": BASE_LR, "epochs": epochs, "lr_sched": {
        "step_size": None, "step_sizes": None, "step_n_times": None,
        "step_after_epoch": None, "gamma": 0.5, **lr_sched_cfg}}
    if steplr is not None:
        cfg["steplr"] = steplr
    sched = lr_schedule(cfg, steps_per_epoch)
    if not callable(sched):
        return np.full(epochs, float(sched))
    # LR in force during epoch e = schedule at that epoch's first step
    return np.array([float(sched(e * steps_per_epoch))
                     for e in range(epochs)])


def test_steplr_parity():
    ref = _torch_lrs(lambda o: torch.optim.lr_scheduler.StepLR(
        o, step_size=7, gamma=0.5))
    np.testing.assert_allclose(_ours_lrs({"step_size": 7}), ref, rtol=1e-6)


def test_multisteplr_parity():
    ms = [10, 17, 30]
    ref = _torch_lrs(lambda o: torch.optim.lr_scheduler.MultiStepLR(
        o, milestones=ms, gamma=0.5))
    np.testing.assert_allclose(_ours_lrs({"step_sizes": ms}), ref,
                               rtol=1e-6)


@pytest.mark.parametrize("after", [None, 12])
def test_step_n_times_parity(after):
    n = 3
    # the reference synthesizes MultiStepLR milestones
    # (utils/training.py:94-103)
    tot = EPOCHS if after is None else EPOCHS - after
    base = 0 if after is None else after
    ms = [(i + 1) * (tot // (n + 1)) + base for i in range(n)]
    ref = _torch_lrs(lambda o: torch.optim.lr_scheduler.MultiStepLR(
        o, milestones=ms, gamma=0.5))
    np.testing.assert_allclose(
        _ours_lrs({"step_n_times": n, "step_after_epoch": after}), ref,
        rtol=1e-6)


def test_constant_when_unset():
    np.testing.assert_allclose(_ours_lrs({}), np.full(EPOCHS, BASE_LR))


def test_duplicate_milestones_match_torch():
    """torch MultiStepLR applies gamma once per *occurrence* of the epoch
    in the milestone list — duplicated milestones double-step."""
    ms = [10, 10, 20]
    ref = _torch_lrs(lambda o: torch.optim.lr_scheduler.MultiStepLR(
        o, milestones=ms, gamma=0.5))
    np.testing.assert_allclose(_ours_lrs({"step_sizes": ms}), ref,
                               rtol=1e-6)
