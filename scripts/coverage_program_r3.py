"""Round-3 coverage program: scaling curve + full-budget category studies.

Drives scripts/coverage_study.py's run_category in ONE process (shared jit
cache across runs) through two stages:

  scaling  — cuboids-v2 at fixed budget (1200 ep) over n_train in
             {8, 16, 32, 48, 96}: the measured coverage-vs-data curve that
             validates (or kills) round-2's "data-bound, not epoch-bound"
             reading of the held-out coverage gap.
  full     — all four categories at n_train=48, epochs=2400, full
             postprocess export: the in-repo answer to the reference's
             ">99% coverage on unseen objects" headline
             (reference README.md:10).

Appends one JSON line per run to --out (default docs/coverage_r3.jsonl).

Usage: python scripts/coverage_program_r3.py [--stage scaling|full|all]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from types import SimpleNamespace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from coverage_study import run_category


def base_args(**over):
    d = dict(
        epochs=1200, n_train=48, n_test=8, pc_points=2048, traj_points=512,
        n_pred_traj_points=256, batch_size=8, percentile=10, split="test",
        seed=7, postprocess=True, bf16=False, norm="batch",
    )
    d.update(over)
    return SimpleNamespace(**d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["scaling", "full", "all"])
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "coverage_r3.jsonl"))
    args = ap.parse_args()

    def record(tag, summary, t0):
        summary = dict(summary)
        summary["tag"] = tag
        summary["wall_sec"] = round(time.time() - t0, 1)
        with open(args.out, "a") as fh:
            fh.write(json.dumps(summary) + "\n")
        print(f"[{tag}] pred_cov={summary['pred_coverage']:.4f} "
              f"gt_cov={summary['gt_coverage']:.4f} "
              f"({summary['wall_sec']}s)", flush=True)

    if args.stage in ("scaling", "all"):
        for n_train in (8, 16, 32, 48, 96):
            t0 = time.time()
            s = run_category("cuboids-v2", base_args(n_train=n_train))
            record(f"scaling_n{n_train}", s, t0)

    if args.stage in ("full", "all"):
        for cat in ("cuboids-v2", "windows-v2", "shelves-v2",
                    "containers-v2"):
            t0 = time.time()
            s = run_category(cat, base_args(epochs=2400, n_train=48))
            record(f"full_{cat}", s, t0)


if __name__ == "__main__":
    main()
