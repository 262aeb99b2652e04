"""Flagship convergence study on real TPU hardware.

Trains the MaskPlanner flagship (PointNet++ StrokeMasks + composite
asymm_chamfer_v9 loss) on deterministic synthetic cuboids with the full
curriculum compressed into a few hundred epochs — PSACD point/segment
weight flips, delayed stroke-mask loss activation, MultiStepLR — and
records the eval PCD and stroke-count metric trajectory. This is the
learning-sanity evidence the reference has no equivalent of (it has no
tests at all): the TPU training path must actually optimize, not just
run.

Usage: python scripts/tpu_convergence_study.py [--epochs 400]
Writes a JSON summary line at the end.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--out", default=None)
    ap.add_argument("--bf16", action="store_true",
                    help="train with bf16 compute (params stay f32)")
    ap.add_argument("--norm", default="batch",
                    help="encoder normalization (batch | layer | none)")
    ap.add_argument("--category", default="cuboids_v2",
                    help="category config (cuboids_v2/windows_v2/...)")
    args = ap.parse_args()

    import train_maskplanner
    from maskplanner_tpu.utils.args import load_args

    out = args.out or tempfile.mkdtemp(prefix="tpu_convergence_")
    ep = args.epochs
    cfg = load_args(argv=[
        f"config=[maskplanner,{args.category},longx_v2]",
        # compress the 4800-epoch curriculum proportionally
        f"epochs={ep}",
        f"eval_freq={max(ep // 8, 1)}",
        f"lr_sched.step_sizes=[{ep//5},{ep//3},{ep//2},{2*ep//3},{5*ep//6}]",
        f"psacd_scheduler.milestones=[{ep//5},{2*ep//5}]",
        f"start_stroke_masks_loss_at={2 * ep // 3}",
        "dataset_size=64", "test_dataset_size=16", "batch_size=32",
        "eval_metrics=[pcd,stroke_masks_metrics]",
        "seed=7", "no_save=true", f"output_dir={out}",
    ] + (["model.bf16=true"] if args.bf16 else [])
      + ([f"model.norm={args.norm}"] if args.norm != "batch" else []))
    run_dir, _ = train_maskplanner.main(cfg)

    logs = [json.loads(l) for l in open(os.path.join(run_dir, "logs.jsonl"))]
    evals = [l for l in logs if "eval_loss" in l]
    for l in evals:
        print(json.dumps({k: l.get(k) for k in (
            "epoch", "train_loss", "eval_loss",
            "point-wise chamfer distance", "perc_correct_n_strokes",
            "avg_num_of_pred_strokes", "avg_num_of_gt_strokes",
            "mean_absolute_error_NoP")}))

    import numpy as np

    pcds = [l["point-wise chamfer distance"] for l in evals
            if "point-wise chamfer distance" in l]
    summary = {
        "epochs": ep,
        "norm": args.norm,
        "eval_points": len(evals),
        "first_pcd_e4": pcds[0] if pcds else None,
        "last_pcd_e4": pcds[-1] if pcds else None,
        "pcd_improved": bool(pcds and pcds[-1] < pcds[0]),
        "final_mae_nop": evals[-1].get("mean_absolute_error_NoP"),
        "finite": bool(np.isfinite([l["train_loss"] for l in logs
                                    if "train_loss" in l]).all()),
        "run_dir": run_dir,
    }
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
