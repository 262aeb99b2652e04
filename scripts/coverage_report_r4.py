"""Render docs tables from the round-4 coverage program records.

Reads docs/coverage_r4.jsonl (written by scripts/coverage_program_r4.py)
and docs/coverage_r3.jsonl (the round-3 baselines) and prints markdown:

  1. augmented full-budget table (augmfull_* vs the r3 full_* rows)
  2. hero-point progression (r3 hero/augmhero + r4 augmhero/scalehero)
  3. confidence-threshold sweep table (sweep_* rows, one line per
     threshold, vs the recorded 0.5 operating point)
  4. shelves operating-point rows (VERDICT r3 item 4)

Usage: python scripts/coverage_report_r4.py [--jsonl docs/coverage_r4.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path):
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def pct(x):
    return f"{100 * x:.1f}%" if x is not None else "—"


def cov_cell(rec):
    return (f"**{pct(rec['pred_coverage'])} / "
            f"{pct(rec.get('pred_coverage_min'))}**")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl",
                    default=os.path.join(REPO, "docs", "coverage_r4.jsonl"))
    ap.add_argument("--r3_jsonl",
                    default=os.path.join(REPO, "docs", "coverage_r3.jsonl"))
    args = ap.parse_args()

    r4 = load(args.jsonl)
    r3 = load(args.r3_jsonl)
    by_tag = {r["tag"]: r for r in r4 if "tag" in r}
    r3_by_tag = {r["tag"]: r for r in r3 if "tag" in r}

    cats = ("cuboids-v2", "windows-v2", "shelves-v2", "containers-v2")

    print("**Augmented full budget** (2400 ep, 48/8, "
          "`pc_online_subsampling`) vs the round-3 plain rows:\n")
    print("| category | r3 plain cov (mean/min) | r4 augmented "
          "(mean/min) | MAE_NoP |")
    print("|---|---|---|---|")
    for c in cats:
        a = by_tag.get(f"augmfull_{c}")
        p = r3_by_tag.get(f"full_{c}")
        if not (a or p):
            continue
        print(f"| {c} | "
              f"{cov_cell(p) if p else '—'} | "
              f"{cov_cell(a) if a else '—'} | "
              f"{a.get('test_mae_nop', '—') if a else '—'} |")

    print("\n**Hero-point progression** (4800 epochs; n_train as shown):\n")
    print("| run | n_train | category | held-out cov (mean/min) | "
          "MAE_NoP |")
    print("|---|---|---|---|---|")
    hero_rows = []
    for src, tagmap in ((r3_by_tag, "hero_"), (r3_by_tag, "augmhero_"),
                        (by_tag, "augmhero_"), (by_tag, "scalehero")):
        for tag, rec in sorted(src.items()):
            if tag.startswith(tagmap) and (tag, id(src)) not in hero_rows:
                hero_rows.append((tag, id(src)))
                label = tag.rsplit("_", 1)[0]
                print(f"| {label} | {rec['n_train']} | {rec['category']} | "
                      f"{cov_cell(rec)} | {rec.get('test_mae_nop', '—')} |")

    sweeps = [r for r in r4 if "confidence_threshold" in r]
    if sweeps:
        print("\n**Postprocess confidence-threshold sweep** "
              "(no retraining; 0.5 = the recorded run):\n")
        print("| base run | thr | held-out cov (mean/min) |")
        print("|---|---|---|")
        for r in sweeps:
            print(f"| {r['base_tag']} | {r['confidence_threshold']} | "
                  f"{cov_cell(r)} |")
        for r in r4:
            if "confidence_threshold" not in r and any(
                    s["base_tag"] == r["tag"] for s in sweeps):
                print(f"| {r['tag']} | 0.5 | {cov_cell(r)} |")

    shelves = [r for r in r4 if r.get("category") == "shelves-v2"
               and "confidence_threshold" not in r]
    if shelves:
        print("\n**shelves-v2 operating points** (VERDICT r3 item 4 — "
              "target ≥93% mean, ≥85% min):\n")
        print("| run | epochs | n_train | cov (mean/min) | MAE_NoP | "
              "pred/GT strokes |")
        print("|---|---|---|---|---|---|")
        for r in shelves:
            print(f"| {r['tag']} | {r['epochs']} | {r['n_train']} | "
                  f"{cov_cell(r)} | {r.get('test_mae_nop', '—')} | "
                  f"{r.get('test_avg_pred_strokes', '—')}/"
                  f"{r.get('test_avg_gt_strokes', '—')} |")


if __name__ == "__main__":
    main()
