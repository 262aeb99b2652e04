"""Generate the packaged config YAML family for maskplanner_tpu.

Config semantics follow the reference config system (configs/maskplanner/*.yaml
in gabrieletiboni/MaskPlanner); values are hyperparameter data required for
user-facing parity. Files are emitted from the spec dicts below.
"""
import os
import yaml

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "maskplanner_tpu", "configs", "maskplanner")

DEFAULT = {
    # run / logging
    "config": None, "name": None, "group": None, "group_suffix": "", "notes": None,
    "wandb": "online",
    # task
    "dataset": None,
    "loss": ["chamfer_with_stroke_masks"],
    "eval_metrics": ["pcd", "stroke_masks_metrics"],
    # segment decomposition
    "lambda_points": 1, "overlapping": 0,
    "stroke_points": None, "n_strokes": None, "stroke_pred": False, "load_pc": False,
    "pc_points": 5120, "traj_points": 500,
    "augmentations": [], "extra_data": [], "weight_orient": 1.0,
    "normalization": "per-dataset", "data_scale_factor": None,
    "train_portion": None, "cache_size": 3000,
    "load_extra_data": ["stroke_masks"],
    # optimization
    "epochs": 1250, "steplr": None,
    "lr_sched": {"gamma": 0.5, "step_size": None, "step_sizes": None,
                 "step_n_times": None, "step_after_epoch": None},
    "batch_size": 32, "lr": 1e-3, "workers": 0,
    "eval_freq": 100, "eval_ckpt": "last",
    "output_dir": None, "debug": False, "no_save": False, "seed": 0,
    "model": {"backbone": "pointnet2_strokemasks", "affinetrans": False,
              "hidden_size": [1024, 1024], "pretrained": True,
              "pretrained_custom": None, "load_strict": False,
              "bf16": False,
              # round-5 flagship recipe (docs/convergence.md); the
              # generator keeps the rationale comment in default.yaml
              "norm": "layer+layer+batch"},
    # loss weights
    "soft_attraction": False,
    "weight_chamfer": 1.0, "weight_attraction_chamfer": 1.0,
    "weight_rich_attraction_chamfer": 1.0, "weight_repulsion": 1.0,
    "weight_mse": 1.0, "weight_align": 1.0, "weight_velcosine": 1.0,
    "weight_intra_align": 1.0, "weight_discriminator": 1.0,
    "weight_discr_training": 1.0, "weight_wdiscriminator": 1.0,
    "weight_asymm_segment_chamfer": 1.0,
    "weight_reverse_asymm_point_chamfer": 1.0,
    "weight_stoch_reverse_asymm_segment_chamfer": 1.0,
    "weight_reverse_asymm_segment_chamfer": 1.0,
    "weight_symm_segment_chamfer": 1.0, "weight_symm_point_chamfer": 1.0,
    "weight_emd": 1.0, "weight_chamfer_with_stroke_masks": 1.0,
    "explicit_weight_stroke_masks": 1.0,
    "explicit_no_stroke_weight": 1.0,
    "explicit_weight_stroke_masks_confidence": 100.0,
    "weight_asymm_v6_chamfer_with_stroke_masks": 1.0,
    "weight_asymm_v11_chamfer_with_stroke_masks": 1.0,
    "weight_symm_v1_chamfer_with_stroke_masks": 1.0,
    "explicit_weight_segments_confidence": 10.0,
    # debug / extras
    "min_centroids": False, "overfitting": False, "rep_target": None,
    "knn_repulsion": 1, "knn_gcn": 20,
    "discr_train_iter": 1, "discr_train_freq": 1, "discr_lambdaGP": 10,
    "discr_input_type": "pointcloud", "discr_backbone": "pointnet2",
    "singlestrokes_norm": False, "generator_input_type": "mesh",
    "random_input_dim": 32, "asymm_overlapping": False,
    # mask-planner specifics
    "max_n_strokes": None, "out_prototypes": None,
    "sample_substroke_v1": False, "sample_substroke_v2": False,
    "delay_stroke_masks_loss": False, "start_stroke_masks_loss_at": 0,
    "smooth_target_stroke_masks": False,
    "traj_with_equally_spaced_points": False,
    "equal_spaced_points_distance": None, "equal_in_3d_space": False,
    "n_pred_traj_points": None,
    "per_segment_confidence": False,
    "delay_segment_conf_loss": False, "start_segment_conf_loss_at": 0,
    "save_intermediate_models": False, "save_intermediate_models_freq": 400,
    "skip_rendering": False, "legacy": False,
    "load_stroke_prototypes": False,
    "psacd_scheduler": {"active": False, "factor": None, "freq": None,
                        "milestones": None},
}


def _loss_recipe(loss, asymm_overlapping, psacd_active, psacd_factor, psacd_freq=None,
                 **weights):
    spec = {
        "batch_size": 32,
        "extra_data": ["orientnorm"], "weight_orient": 0.25,
        "lambda_points": 4, "overlapping": 1,
        "loss": [loss],
        "asymm_overlapping": asymm_overlapping,
        "psacd_scheduler": {"active": psacd_active, "factor": psacd_factor,
                            "freq": psacd_freq, "milestones": None},
        "eval_ckpt": "last",
    }
    spec.update(weights)
    return spec


def _epoch_budget(epochs, eval_freq, wsf, delay_at, steplr=None):
    d = {"epochs": epochs, "eval_freq": eval_freq,
         "start_stroke_masks_loss_at": delay_at,
         "start_segment_conf_loss_at": delay_at}
    if wsf is not None:
        d["weight_scheduler_freq"] = wsf
    if steplr is not None:
        d["steplr"] = steplr
    return d


CONFIGS = {
    "default": DEFAULT,

    # ---- loss recipes -----------------------------------------------------
    "asymm_chamfer_v6": _loss_recipe(
        "asymm_v6_chamfer_with_stroke_masks", True, True, 0.1,
        weight_asymm_segment_chamfer=1.0,
        weight_reverse_asymm_point_chamfer=100,
        weight_reverse_asymm_segment_chamfer=0.01),
    "asymm_chamfer_v9": _loss_recipe(
        "asymm_v6_chamfer_with_stroke_masks", False, True, 0.1,
        weight_asymm_segment_chamfer=1.0,
        weight_reverse_asymm_point_chamfer=100,
        weight_reverse_asymm_segment_chamfer=0.01),
    "asymm_chamfer_v11": _loss_recipe(
        "asymm_v11_chamfer_with_stroke_masks", False, False, 0.0,
        weight_asymm_segment_chamfer=1.0,
        weight_reverse_asymm_point_chamfer=1.0),
    "asymm_chamfer_v12": _loss_recipe(
        "asymm_v6_chamfer_with_stroke_masks", False, False, 0.0,
        weight_asymm_segment_chamfer=1.0,
        weight_reverse_asymm_point_chamfer=1.0,
        weight_reverse_asymm_segment_chamfer=1.0),
    "asymm_chamfer_v13": _loss_recipe(
        "asymm_v6_chamfer_with_stroke_masks", False, True, 0.1, psacd_freq=1600,
        weight_asymm_segment_chamfer=1.0,
        weight_reverse_asymm_point_chamfer=1.0,
        weight_reverse_asymm_segment_chamfer=0.01),
    "symm_chamfer_v1": _loss_recipe(
        "symm_v1_chamfer_with_stroke_masks", False, True, 0.1,
        weight_symm_point_chamfer=100,
        weight_symm_segment_chamfer=0.01),
    "symm_chamfer_v3": _loss_recipe(
        "symm_v1_chamfer_with_stroke_masks", False, False, 0.0,
        weight_symm_point_chamfer=1.0,
        weight_symm_segment_chamfer=1.0),
    "stable_v1": {
        "batch_size": 32, "loss": ["chamfer_with_stroke_masks"],
        "extra_data": ["orientnorm"], "weight_orient": 0.25,
        "lambda_points": 4, "overlapping": 1,
    },
    "lambda1": {
        "batch_size": 32, "loss": ["chamfer_with_stroke_masks"],
        "extra_data": ["orientnorm"], "weight_orient": 0.25,
        "lambda_points": 1, "overlapping": 0,
    },

    # ---- categories -------------------------------------------------------
    "cuboids_v2": {"dataset": "cuboids-v2", "traj_points": 2000,
                   "n_pred_traj_points": 3000, "stroke_points": 330,
                   "n_strokes": 6, "max_n_strokes": 6, "batch_size": 64},
    "windows_v2": {"dataset": "windows-v2", "traj_points": 675,
                   "n_pred_traj_points": 1350, "max_n_strokes": 22,
                   "batch_size": 64},
    "shelves_v2": {"dataset": "shelves-v2", "traj_points": 3000,
                   "n_pred_traj_points": 3800, "max_n_strokes": 41,
                   "batch_size": 64},
    "containers_v2": {"dataset": "containers-v2", "traj_points": 1000,
                      "n_pred_traj_points": 4000, "max_n_strokes": 33},

    # ---- joint / few-shot -------------------------------------------------
    "jointTraining_v2": {"dataset": ["cuboids-v2", "windows-v2", "shelves-v2",
                                     "containers-v2"],
                         "traj_points": 3000, "n_pred_traj_points": 3800,
                         "max_n_strokes": 41, "batch_size": 64},
    "jointCategory_1-2-3": {"dataset": ["cuboids-v2", "windows-v2", "shelves-v2"],
                            "traj_points": 3000, "n_pred_traj_points": 3800,
                            "max_n_strokes": 41, "batch_size": 64},
    "from_1-2-3_to_4": {"dataset": "containers-v2",
                        "data_scale_factor": 776.1721217165386,
                        "n_pred_traj_points": 3800, "max_n_strokes": 41,
                        "batch_size": 64,
                        "model": {"pretrained_custom": None}},
    "from_1-2-3_to_4_pretrained": {"dataset": "containers-v2",
                                   "data_scale_factor": 776.1721217165386,
                                   "n_pred_traj_points": 3800,
                                   "max_n_strokes": 41, "batch_size": 64,
                                   "model": {"pretrained_custom":
                                             "pretrained_models/EBW7Q-S42"}},
    "fewshot": {"train_portion": 0.0},

    # ---- epoch budgets ----------------------------------------------------
    "longx_v2": _epoch_budget(4800, 200, None, 3200),
    "longx_v3": _epoch_budget(4800, 200, 1600, 3200, steplr=1600),
    "long_v2": _epoch_budget(3600, 200, 1200, 2400),
    "medium_v2": _epoch_budget(2400, 100, 800, 1600),
    "short_v2": _epoch_budget(1200, 50, 400, 800),
    "shortx_v2": _epoch_budget(600, 25, 200, 400),
    "ConvSpeed_trainFor_240": _epoch_budget(240, 20, 80, 160, steplr=40),
    "ConvSpeed_trainFor_480": _epoch_budget(480, 40, 160, 320, steplr=80),
    "ConvSpeed_trainFor_720": _epoch_budget(720, 60, 240, 480, steplr=120),
    "ConvSpeed_trainFor_960": _epoch_budget(960, 80, 320, 640, steplr=160),

    # ---- LR schedules -----------------------------------------------------
    "sched_v1": {"lr_sched": {"step_size": 800}, "psacd_scheduler": {"freq": 1600}},
    "sched_v2": {"lr_sched": {"step_size": 1600}, "psacd_scheduler": {"freq": 1600}},
    "sched_v3": {"lr_sched": {"step_size": 2400}, "psacd_scheduler": {"freq": 1600}},
    "sched_v4": {"lr_sched": {"step_n_times": 2, "step_after_epoch": 3200},
                 "psacd_scheduler": {"freq": 1600}},
    "sched_v5": {"lr_sched": {"step_n_times": 5, "step_after_epoch": 2400},
                 "psacd_scheduler": {"freq": 1600}},
    "sched_v6": {"lr_sched": {"step_n_times": None, "step_after_epoch": None,
                              "step_sizes": [1600, 2400, 3200, 4000]},
                 "psacd_scheduler": {"freq": 1600}},
    "sched_v7": {"lr_sched": {"step_n_times": None, "step_after_epoch": None,
                              "step_sizes": [1600, 2240, 2880, 3520, 4160]},
                 "psacd_scheduler": {"freq": 1600}},
    "sched_v8": {"lr_sched": {"step_n_times": None, "step_after_epoch": None,
                              "step_sizes": [1000, 2000, 3000, 4000]},
                 "psacd_scheduler": {"freq": None, "milestones": [1000, 2000]}},
    "sched_v9": {"lr_sched": {"step_n_times": None, "step_after_epoch": None,
                              "step_sizes": [1000, 1760, 2520, 3280, 4040]},
                 "psacd_scheduler": {"freq": None, "milestones": [1000, 2000]}},

    # ---- sampling ---------------------------------------------------------
    "traj_sampling_v2": {"traj_with_equally_spaced_points": True,
                         "equal_spaced_points_distance": 0.05,
                         "equal_in_3d_space": False},
    "traj_sampling_v3": {"traj_with_equally_spaced_points": True,
                         "equal_spaced_points_distance": 0.05,
                         "equal_in_3d_space": True},

    # ---- misc -------------------------------------------------------------
    "delayMasksLoss": {"explicit_weight_stroke_masks": 0.0,
                       "explicit_weight_stroke_masks_confidence": 0.0,
                       "target_explicit_weight_stroke_masks": 1.0,
                       "target_explicit_weight_stroke_masks_confidence": 100.0,
                       "delay_stroke_masks_loss": True},
    "debug": {"no_save": True, "debug": True, "batch_size": 2, "epochs": 20,
              "eval_freq": 10, "wandb": "disabled"},
    "legacy": {"legacy": True, "explicit_no_stroke_weight": 0.5},
    "latest": {"latest": True},
    "augm_v1": {"augmentations": ["pc_online_subsampling"]},
}


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, spec in CONFIGS.items():
        path = os.path.join(OUT, name + ".yaml")
        with open(path, "w", encoding="utf-8") as f:
            f.write("---\n")
            yaml.safe_dump(spec, f, default_flow_style=None, sort_keys=False)
    print(f"wrote {len(CONFIGS)} configs to {OUT}")


if __name__ == "__main__":
    main()
