"""Measure the cover-all concat fix on saved runs (no retraining).

Re-exports each recorded coverage run's prediction dumps through the
postprocess with ``--cover_all`` (split off-Edmonds-path segments into
sub-strokes instead of dropping them) and re-simulates coverage,
appending ``coverall_<base tag>`` rows. CPU-only — the saved ``.npy``
dumps already contain the predictions.

Usage: python scripts/coverall_eval_r5.py [--jsonl docs/coverage_r4.jsonl]
           [--out docs/coverage_r5.jsonl] [--tags tag1 tag2 ...]
           [--confidence_threshold 0.5]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, os.path.join(REPO, "standalone"))


def rescore(rec: dict, extra_flags: list[str], out_subdir: str,
            per_arclength: bool = False,
            reuse_programs: bool = False) -> dict | None:
    import from_pred_to_offline_v2 as export_tool
    from compute_paint_coverage_per_face import coverage_for_pair
    from maskplanner_tpu.sim import simulate_program

    run_dir = rec["run_dir"]
    category = rec["category"]
    tmp = os.path.dirname(run_dir)
    cat_dir = os.path.join(tmp, "paintnet", category)
    if not (os.path.isdir(run_dir) and os.path.isdir(cat_dir)):
        print(f"SKIP {rec.get('tag')}: run artifacts gone ({run_dir})",
              flush=True)
        return None

    t0 = time.time()
    progs = os.path.join(tmp, out_subdir)
    gt_dir = os.path.join(progs, f"gt_{category}")
    pred_dir = os.path.join(progs, f"pred_{category}")
    if not (reuse_programs and os.path.isdir(pred_dir)):
        old_argv = sys.argv
        sys.argv = (["from_pred_to_offline_v2.py", "--run", run_dir,
                     "--output_dir", progs, "--model", "last",
                     "--split", rec["split"], "--postprocess",
                     "--force_overwrite"] + extra_flags)
        try:
            export_tool.main()
        finally:
            sys.argv = old_argv

    per_item, covs = {}, []
    for fname in sorted(os.listdir(gt_dir)):
        name = os.path.splitext(fname)[0]
        mesh = os.path.join(cat_dir, name, f"{name}.obj")
        orig = os.path.join(cat_dir, name, f"{name}_trajectory.txt")
        truth = simulate_program(
            mesh, orig, per_arclength=per_arclength).reshape(-1, 3).mean(1)
        pred = simulate_program(
            mesh, os.path.join(pred_dir, fname),
            per_arclength=per_arclength).reshape(-1, 3).mean(1)
        p = coverage_for_pair(truth, pred,
                              percentile=rec.get("percentile", 10))
        per_item[name] = round(float(p), 4)
        covs.append(p)
    return dict(
        category=category, base_tag=rec["tag"],
        pred_coverage=round(float(np.mean(covs)), 4),
        pred_coverage_min=round(float(np.min(covs)), 4),
        per_item=per_item, run_dir=run_dir, split=rec["split"],
        epochs=rec.get("epochs"), n_train=rec.get("n_train"),
        flags=extra_flags, wall_sec=round(time.time() - t0, 1),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", default=os.path.join(
        REPO, "docs", "coverage_r4.jsonl"))
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "coverage_r5.jsonl"))
    ap.add_argument("--tags", nargs="*", default=None)
    ap.add_argument("--confidence_threshold", type=float, default=None)
    ap.add_argument("--arclength", action="store_true",
                    help="score under the constant-speed (per-arc-length)"
                         " deposition model instead of per-pose; rows "
                         "get an arclen_ tag prefix")
    ap.add_argument("--reuse_programs", action="store_true",
                    help="skip re-export when the programs dir exists")
    args = ap.parse_args()

    recs = []
    with open(args.jsonl) as fh:
        for line in fh:
            r = json.loads(line)
            if ("tag" in r and "confidence_threshold" not in r
                    and r.get("kind") != "pretrain"):
                recs.append(r)
    if args.tags:
        recs = [r for r in recs if r["tag"] in args.tags]

    flags = ["--cover_all"]
    if args.confidence_threshold is not None:
        flags += ["--confidence_threshold",
                  str(args.confidence_threshold)]
    for rec in recs:
        row = rescore(rec, flags, "programs_coverall",
                      per_arclength=args.arclength,
                      reuse_programs=args.reuse_programs)
        if row is None:
            continue
        prefix = "arclen_coverall_" if args.arclength else "coverall_"
        row["tag"] = f"{prefix}{rec['tag']}"
        if args.arclength:
            row["metric"] = "per_arclength"
        if args.confidence_threshold is not None:
            row["confidence_threshold"] = args.confidence_threshold
        with open(args.out, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        base = rec.get("pred_coverage")
        print(f"[{row['tag']}] {base} -> {row['pred_coverage']} "
              f"(min {rec.get('pred_coverage_min')} -> "
              f"{row['pred_coverage_min']}) ({row['wall_sec']}s)",
              flush=True)


if __name__ == "__main__":
    main()
