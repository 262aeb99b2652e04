"""LR schedule, PSACD curriculum, delayed-loss activation and config tests."""
import glob
import os

import numpy as np
import pytest

from maskplanner_tpu.train.schedulers import (
    PSACDScheduler,
    apply_delayed_activations,
    lr_schedule,
)
from maskplanner_tpu.utils.args import config_aliases, load_args


class TestLRSchedule:
    def test_multistep_milestones(self):
        cfg = load_args(argv=["config=[maskplanner,cuboids_v2,longx_v2]"])
        sched = lr_schedule(cfg, steps_per_epoch=10)
        # sched_v9: gamma 0.5 at [1000,1760,2520,3280,4040] epochs
        assert np.isclose(float(sched(0)), 1e-3)
        assert np.isclose(float(sched(999 * 10)), 1e-3)
        assert np.isclose(float(sched(1001 * 10)), 5e-4)
        assert np.isclose(float(sched(1761 * 10)), 2.5e-4)
        assert np.isclose(float(sched(4100 * 10)), 1e-3 * 0.5**5)

    def test_step_size(self):
        cfg = load_args(argv=["config=[maskplanner,cuboids_v2]",
                              "lr_sched.step_sizes=null",
                              "lr_sched.step_size=100", "epochs=350"])
        sched = lr_schedule(cfg, steps_per_epoch=1)
        assert np.isclose(float(sched(99)), 1e-3)
        assert np.isclose(float(sched(101)), 5e-4)
        assert np.isclose(float(sched(201)), 2.5e-4)

    def test_step_n_times(self):
        cfg = load_args(argv=["config=[maskplanner,cuboids_v2]",
                              "lr_sched.step_sizes=null",
                              "lr_sched.step_n_times=2",
                              "lr_sched.step_after_epoch=100", "epochs=400"])
        sched = lr_schedule(cfg, steps_per_epoch=1)
        # milestones at 100 + i*(300//3): 200, 300
        assert np.isclose(float(sched(150)), 1e-3)
        assert np.isclose(float(sched(250)), 5e-4)
        assert np.isclose(float(sched(350)), 2.5e-4)


class TestPSACD:
    def test_milestone_stepping(self):
        cfg = load_args(argv=["config=[maskplanner,cuboids_v2,longx_v2]"])
        psacd = PSACDScheduler(cfg.psacd_scheduler)
        weights = {"weight_reverse_asymm_point_chamfer": 100.0,
                   "weight_reverse_asymm_segment_chamfer": 0.01}
        assert not psacd.is_time_to_step(998, 4800)
        assert psacd.is_time_to_step(999, 4800)  # epoch+1 == 1000
        weights = psacd.step_loss_weights(weights)
        assert np.isclose(weights["weight_reverse_asymm_point_chamfer"], 10.0)
        assert np.isclose(weights["weight_reverse_asymm_segment_chamfer"], 0.1)
        # never steps at final epoch (reference :476)
        psacd2 = PSACDScheduler({"freq": 10, "factor": 0.1, "milestones": None})
        assert not psacd2.is_time_to_step(9, 10)

    def test_delayed_activation(self):
        cfg = load_args(argv=["config=[maskplanner,cuboids_v2,longx_v2]"])
        weights = {"explicit_weight_stroke_masks": 0.0,
                   "explicit_weight_stroke_masks_confidence": 0.0}
        weights = apply_delayed_activations(cfg, weights, epoch=100)
        assert weights["explicit_weight_stroke_masks"] == 0.0
        weights = apply_delayed_activations(cfg, weights, epoch=3199)
        assert weights["explicit_weight_stroke_masks"] == 1.0
        assert weights["explicit_weight_stroke_masks_confidence"] == 100.0


class TestConfigFamily:
    def test_all_packaged_configs_load(self):
        from maskplanner_tpu.utils.args import _PKG_CONFIG_ROOT

        stems = [os.path.splitext(os.path.basename(p))[0]
                 for p in glob.glob(os.path.join(_PKG_CONFIG_ROOT, "*.yaml"))]
        assert len(stems) >= 45
        for stem in stems:
            if stem == "default":
                continue
            cfg = load_args(argv=[f"config=[{stem}]"])
            assert "loss" in cfg and "lambda_points" in cfg

    def test_aliases_expand(self):
        for alias, files in config_aliases().items():
            cfg = load_args(argv=[f"config=[{alias}]"])
            group = cfg.auto_wandb_group.lower()
            for f in files:
                assert f.lower() in group, (alias, f, group)

    def test_priority_cli_over_files(self):
        cfg = load_args(argv=["config=[maskplanner,cuboids_v2]",
                              "batch_size=7", "model.backbone=pointnet2"])
        assert cfg.batch_size == 7
        assert cfg.model.backbone == "pointnet2"
        # later config file wins over earlier
        cfg2 = load_args(argv=["config=[cuboids_v2,windows_v2]"])
        assert cfg2.dataset == ["windows-v2"]
