"""Render docs tables from the round-3 coverage program records.

Reads docs/coverage_r3.jsonl (written by scripts/coverage_program_r3.py)
plus each run's logs.jsonl and prints markdown:

  1. full-budget per-category coverage table
  2. coverage-vs-n_train scaling table
  3. per-category stroke-count (mask head) convergence curves
     (epoch, eval PCD, MAE_NoP, avg pred/GT strokes) — the evidence the
     mask head converges on every category, not just the easy ones

Usage: python scripts/coverage_report_r3.py [--jsonl docs/coverage_r3.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os


def load_records(path):
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def run_curve(run_dir):
    """Eval-epoch metric rows from a run's logs.jsonl."""
    rows = []
    log = os.path.join(run_dir, "logs.jsonl")
    if not os.path.isfile(log):
        return rows
    with open(log) as fh:
        for line in fh:
            r = json.loads(line)
            if "mean_absolute_error_NoP" in r:
                rows.append(dict(
                    epoch=r.get("epoch"),
                    pcd=r.get("point-wise chamfer distance"),
                    mae=r.get("mean_absolute_error_NoP"),
                    pred=r.get("avg_num_of_pred_strokes"),
                    gt=r.get("avg_num_of_gt_strokes"),
                    eval_loss=r.get("eval_loss"),
                ))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", default="docs/coverage_r3.jsonl")
    ap.add_argument("--curves", action="store_true",
                    help="print per-run convergence curves")
    args = ap.parse_args()
    recs = load_records(args.jsonl)

    full = [r for r in recs if r["tag"].startswith(("full_", "hero_",
                                                    "normlayer_", "bf16_"))]
    if full:
        print("| run | category | n_train | epochs | GT roundtrip | "
              "pred cov (mean) | pred cov (min) | eval PCD ×10⁴ | "
              "MAE_NoP | pred/GT strokes |")
        print("|---|---|---|---|---|---|---|---|---|---|")
        for r in full:
            print(f"| {r['tag']} | {r['category']} | {r['n_train']} | "
                  f"{r['epochs']} | {100*r['gt_coverage']:.1f}% | "
                  f"**{100*r['pred_coverage']:.1f}%** | "
                  f"{100*r['pred_coverage_min']:.1f}% | "
                  f"{r.get('test_pcd', float('nan')):.0f} | "
                  f"{r.get('test_mae_nop', float('nan')):.2f} | "
                  f"{r.get('test_avg_pred_strokes', float('nan')):.1f}"
                  f"/{r.get('test_avg_gt_strokes', float('nan')):.1f} |")

    scaling = [r for r in recs if r["tag"].startswith("scaling_")]
    if scaling:
        print("\n| n_train (cuboids-v2, 1200 ep) | pred cov | min | "
              "eval PCD ×10⁴ | MAE_NoP |")
        print("|---|---|---|---|---|")
        for r in scaling:
            print(f"| {r['n_train']} | {100*r['pred_coverage']:.1f}% | "
                  f"{100*r['pred_coverage_min']:.1f}% | "
                  f"{r.get('test_pcd', float('nan')):.0f} | "
                  f"{r.get('test_mae_nop', float('nan')):.2f} |")

    if args.curves:
        for r in full:
            rows = run_curve(r["run_dir"])
            if not rows:
                continue
            print(f"\n### {r['tag']} convergence "
                  f"({r['category']}, {r['epochs']} ep)")
            print("| epoch | eval PCD ×10⁴ | MAE_NoP | pred strokes | "
                  "GT strokes |")
            print("|---|---|---|---|---|")
            for c in rows:
                print(f"| {c['epoch']} | {c['pcd']:.0f} | {c['mae']:.2f} | "
                      f"{c['pred']:.2f} | {c['gt']:.2f} |")


if __name__ == "__main__":
    main()
