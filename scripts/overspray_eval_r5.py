"""Precision-side evidence for the cover-all coverage claim.

The reference's coverage metric is RECALL-only (% of GT-covered faces
also covered by the prediction, compute_paint_coverage_per_face.py) —
and executing ALL predicted segments (cover_all) makes recall easy to
saturate: an untrained 8-epoch model reaches 100% by dousing the whole
object (smoke record, /tmp/smoke_r5.jsonl). The trained runs' ≥99%
claims therefore need the precision side reported too:

  overspray  — % of GT-UNcovered faces (truth thickness below the GT
               threshold) that the prediction paints above threshold;
               garbage models ≈ 100%, a faithful program ≈ GT's own.
  gt_overspray — the same number for the exported GT program (the
               pipeline's own floor: λ-segmentation + export roundtrip).
  pose_ratio — predicted program poses / original program poses (paint
               mass proxy; the simulator deposits per pose).

Usage: python scripts/overspray_eval_r5.py [--jsonl docs/coverage_r5.jsonl]
           [--tags coverall_* ...] [--out docs/overspray_r5.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "standalone"))


def program_len(path):
    with open(path) as fh:
        return sum(1 for _ in fh) - 1


def eval_row(rec, programs_subdir="programs_coverall",
             per_arclength=False):
    from maskplanner_tpu.sim import simulate_program as _sim

    def simulate_program(mesh, prog):
        return _sim(mesh, prog, per_arclength=per_arclength)

    run_dir = rec["run_dir"]
    tmp = os.path.dirname(run_dir)
    cat = rec["category"]
    cat_dir = os.path.join(tmp, "paintnet", cat)
    progs = os.path.join(tmp, programs_subdir)
    gt_dir = os.path.join(progs, f"gt_{cat}")
    pred_dir = os.path.join(progs, f"pred_{cat}")
    if not os.path.isdir(pred_dir):
        return None

    over, gt_over, ratios = [], [], []
    for fname in sorted(os.listdir(gt_dir)):
        name = os.path.splitext(fname)[0]
        mesh = os.path.join(cat_dir, name, f"{name}.obj")
        orig = os.path.join(cat_dir, name, f"{name}_trajectory.txt")
        truth = simulate_program(mesh, orig).reshape(-1, 3).mean(1)
        gt = simulate_program(
            mesh, os.path.join(gt_dir, fname)).reshape(-1, 3).mean(1)
        pred = simulate_program(
            mesh, os.path.join(pred_dir, fname)).reshape(-1, 3).mean(1)
        nonzero = ~np.isclose(truth, 0.0)
        thr = np.percentile(truth[nonzero], rec.get("percentile", 10))
        uncov = ~(nonzero & (truth >= thr))
        if uncov.sum():
            over.append(float((pred[uncov] >= thr).mean()))
            gt_over.append(float((gt[uncov] >= thr).mean()))
        ratios.append(program_len(os.path.join(pred_dir, fname))
                      / max(program_len(orig), 1))
    return dict(
        tag=rec["tag"], category=cat,
        pred_coverage=rec.get("pred_coverage"),
        overspray=round(float(np.mean(over)), 4),
        overspray_max=round(float(np.max(over)), 4),
        gt_overspray=round(float(np.mean(gt_over)), 4),
        pose_ratio=round(float(np.mean(ratios)), 3),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", default=os.path.join(
        REPO, "docs", "coverage_r5.jsonl"))
    ap.add_argument("--tags", nargs="*", default=None)
    ap.add_argument("--programs_subdir", default="programs_coverall")
    ap.add_argument("--arclength", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "overspray_r5.jsonl"))
    args = ap.parse_args()

    with open(args.jsonl) as fh:
        recs = [json.loads(l) for l in fh if l.strip()]
    rows = []
    for rec in recs:
        if rec.get("kind") == "pretrain" or "confidence_threshold" in rec:
            continue
        if args.tags and rec["tag"] not in args.tags:
            continue
        sub = (args.programs_subdir if "coverall_" in rec["tag"]
               else "programs")
        row = eval_row(rec, sub, per_arclength=args.arclength)
        if row is None:
            print(f"SKIP {rec['tag']}", flush=True)
            continue
        if args.arclength:
            row["tag"] = f"arclen_{row['tag']}"
            row["metric"] = "per_arclength"
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:
            with open(args.out, "a") as fh:
                fh.write(json.dumps(row) + "\n")

    print("\n| run | coverage | overspray (mean/max) | GT-export overspray "
          "| pose ratio |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['tag']} | {100*(r['pred_coverage'] or 0):.1f}% | "
              f"{100*r['overspray']:.1f}% / {100*r['overspray_max']:.1f}% | "
              f"{100*r['gt_overspray']:.1f}% | {r['pose_ratio']:.2f} |")


if __name__ == "__main__":
    main()
