"""Render docs tables from the round-5 coverage records.

Reads docs/coverage_r5.jsonl (coverall_* re-scores, combo_* training
runs, normhybrid_* qualification runs, the pretrain_joint row) and emits
markdown; --write splices them into docs/coverage.md between the
`<!-- R5_TABLES -->` markers (idempotent).

Usage: python scripts/coverage_report_r5.py [--write]
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from coverage_report_r4 import load, pct, cov_cell, splice

CATS = ("cuboids-v2", "windows-v2", "shelves-v2", "containers-v2")


def render(r5_path, r3_path, r4_path):
    r5 = load(r5_path)
    r4 = {r["tag"]: r for r in load(r4_path)
          if "tag" in r and "confidence_threshold" not in r}
    r3 = {r["tag"]: r for r in load(r3_path)
          if "tag" in r and "confidence_threshold" not in r}
    out = io.StringIO()
    w = lambda *a: print(*a, file=out)

    coverall = [r for r in r5 if r.get("tag", "").startswith("coverall_")]
    if coverall:
        w("**Cover-all re-scores of the round-4 runs** (same checkpoints, "
          "same dumps; only the concat drop behavior fixed):\n")
        w("| base run | category | recorded (mean/min) | cover-all "
          "(mean/min) |")
        w("|---|---|---|---|")
        for r in coverall:
            base = r4.get(r["base_tag"]) or r3.get(r["base_tag"]) or {}
            w(f"| {r['base_tag']} | {r['category']} | "
              f"{cov_cell(base) if base else '—'} | {cov_cell(r)} |")

    pre = [r for r in r5 if r.get("kind") == "pretrain"]
    for r in pre:
        w(f"\n**Warm-start checkpoint** `pretrain_joint`: "
          f"{r['epochs']} epochs on {r['n_train']} joint-corpus items "
          f"({', '.join(r['categories'])}), test PCD "
          f"{r.get('test_pcd', '—')}, MAE_NoP {r.get('test_mae_nop', '—')} "
          f"({r.get('tot_train_seconds', '—')}s train).")

    combos = [r for r in r5 if r.get("tag", "").startswith("combo_")]
    if combos:
        w("\n**Combined-lever runs** (encoder warm start + per-category "
          "winning levers, cover-all exports):\n")
        w("| category | epochs | n_train | held-out cov (mean/min) | "
          "MAE_NoP | best prior (mean/min) |")
        w("|---|---|---|---|---|---|")
        prior = {
            "cuboids-v2": "coverall_scalehero192_cuboids-v2",
            "windows-v2": "coverall_augmhero_windows-v2",
            "shelves-v2": "coverall_shelvesfix_maskstart_shelves-v2",
            "containers-v2": "coverall_augmhero_containers-v2",
        }
        co_by = {r["tag"]: r for r in coverall}
        for r in combos:
            p = co_by.get(prior.get(r["category"], ""), {})
            w(f"| {r['category']} | {r['epochs']} | {r['n_train']} | "
              f"{cov_cell(r)} | {r.get('test_mae_nop', '—')} | "
              f"{cov_cell(p) if p else '—'} |")

    hyb = [r for r in r5 if r.get("tag", "").startswith("normhybrid_")]
    if hyb:
        w("\n**Hybrid-norm qualification** (`model.norm=layer+layer+batch`"
          ", full budget 2400/48, no augmentation, vs the r3 all-BatchNorm"
          " rows — the fused Pallas train path's convergence evidence):\n")
        w("| category | BatchNorm cov (mean/min) | hybrid cov (mean/min) |"
          " BN MAE_NoP | hybrid MAE_NoP |")
        w("|---|---|---|---|---|")
        for r in hyb:
            base = r3.get(f"full_{r['category']}", {})
            w(f"| {r['category']} | {cov_cell(base) if base else '—'} | "
              f"{cov_cell(r)} | "
              f"{base.get('test_mae_nop', '—') if base else '—'} | "
              f"{r.get('test_mae_nop', '—')} |")

    sweeps = [r for r in r5 if "confidence_threshold" in r
              and not r.get("tag", "").startswith("coverall_")]
    if sweeps:
        w("\n**Confidence-threshold sweep on the round-5 runs** "
          "(cover-all exports; 0.5 = the recorded run):\n")
        w("| base run | thr | held-out cov (mean/min) |")
        w("|---|---|---|")
        by_tag = {r["tag"]: r for r in r5
                  if "tag" in r and "confidence_threshold" not in r}
        base_tags = []
        for r in sweeps:
            if r["base_tag"] not in base_tags:
                base_tags.append(r["base_tag"])
        for bt in base_tags:
            rows = [r for r in sweeps if r["base_tag"] == bt]
            base = by_tag.get(bt)
            merged = sorted(
                rows + ([dict(base, confidence_threshold=0.5)]
                        if base else []),
                key=lambda r: r["confidence_threshold"])
            for r in merged:
                w(f"| {bt} | {r['confidence_threshold']} | {cov_cell(r)} |")

    return out.getvalue()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", default=os.path.join(
        REPO, "docs", "coverage_r5.jsonl"))
    ap.add_argument("--r3_jsonl", default=os.path.join(
        REPO, "docs", "coverage_r3.jsonl"))
    ap.add_argument("--r4_jsonl", default=os.path.join(
        REPO, "docs", "coverage_r4.jsonl"))
    ap.add_argument("--write", nargs="?", const=os.path.join(
        REPO, "docs", "coverage.md"), default=None)
    args = ap.parse_args()

    text = render(args.jsonl, args.r3_jsonl, args.r4_jsonl)
    if args.write:
        splice(args.write, text, begin="<!-- R5_TABLES -->",
               end="<!-- /R5_TABLES -->")
        print(f"wrote tables into {args.write}", file=sys.stderr)
    else:
        print(text, end="")


if __name__ == "__main__":
    main()
