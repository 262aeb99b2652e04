"""Round-4 coverage program: close the gap to the >=99% north star.

VERDICT r3 items 3+4. Round 3 established (docs/coverage_r3.jsonl):
  - full budget (2400 ep, 48/8) tops out at 89.5-95.0% across categories;
  - the one augmented hero run (augmhero_cuboids-v2: pc_online_subsampling,
    4800 ep, 96/8) reached 98.1% — the single most promising lever;
  - shelves-v2 is the weak category (89.5%, per-item min 79.7%).

This program runs the augmented stages the round-3 plan defined but never
executed, plus an offline postprocess confidence-threshold sweep on the
saved dumps (no retraining):

  augmfull — all four categories at the full-budget point (2400 ep, 48/8)
             WITH pc_online_subsampling, head-to-head vs the r3 `full_*`
             rows. The shelves row is VERDICT item 4's operating point.
  augmhero — windows/shelves/containers at the hero point (4800 ep, 96/8)
             with augmentation (cuboids already recorded: 98.1%).
  sweep    — for each recorded r4 run: re-export the saved .npy dumps at
             confidence thresholds {0.3, 0.4, 0.5, 0.6} and re-simulate
             (CPU-only; the reference's DETR-style filter,
             utils/postprocessing.py:126-131).

Appends one JSON line per run to --out (default docs/coverage_r4.jsonl).

Usage: python scripts/coverage_program_r4.py [--stage augmfull|augmhero|
                                              sweep|all]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from types import SimpleNamespace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, os.path.join(REPO, "standalone"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cc_cache")

from coverage_study import run_category

_SHAPES = dict(traj_points=896, n_pred_traj_points=448)


def base_args(**over):
    d = dict(
        epochs=2400, n_train=48, n_test=8, pc_points=2048,
        batch_size=8, percentile=10, split="test",
        seed=7, postprocess=True, bf16=False, norm="batch",
        augment=True, deterministic=True, mesh_edge=0.10, max_n_strokes=12,
        eval_divisor=16, **_SHAPES,
    )
    d.update(over)
    return SimpleNamespace(**d)


def record(out_path, tag, summary, t0):
    summary = dict(summary)
    summary["tag"] = tag
    summary["wall_sec"] = round(time.time() - t0, 1)
    with open(out_path, "a") as fh:
        fh.write(json.dumps(summary) + "\n")
    print(f"[{tag}] pred_cov={summary['pred_coverage']:.4f} "
          f"gt_cov={summary.get('gt_coverage', float('nan')):.4f} "
          f"({summary['wall_sec']}s)", flush=True)


def sweep_thresholds(rec: dict, thresholds=(0.1, 0.3, 0.6)) -> list:
    """Re-export a recorded run's saved dumps at alternative mask
    confidence thresholds and re-score coverage. CPU-only: no retraining,
    no TPU. The 0.5 point is the recorded run itself."""
    import numpy as np

    import from_pred_to_offline_v2 as export_tool
    from compute_paint_coverage_per_face import coverage_for_pair
    from maskplanner_tpu.sim import simulate_program

    run_dir = rec["run_dir"]
    category = rec["category"]
    tmp = os.path.dirname(run_dir)
    cat_dir = os.path.join(tmp, "paintnet", category)
    if not (os.path.isdir(run_dir) and os.path.isdir(cat_dir)):
        print(f"[sweep] SKIP {rec.get('tag')}: run artifacts gone "
              f"({run_dir})", flush=True)
        return []

    rows = []
    for thr in thresholds:
        t0 = time.time()
        progs = os.path.join(tmp, f"programs_thr{thr}")
        old_argv = sys.argv
        sys.argv = (["from_pred_to_offline_v2.py", "--run", run_dir,
                     "--output_dir", progs, "--model", "last",
                     "--split", rec["split"], "--postprocess",
                     "--confidence_threshold", str(thr)]
                    + (["--cover_all"] if rec.get("cover_all") else []))
        try:
            export_tool.main()
        finally:
            sys.argv = old_argv

        gt_dir = os.path.join(progs, f"gt_{category}")
        pred_dir = os.path.join(progs, f"pred_{category}")
        per_item, covs = {}, []
        for fname in sorted(os.listdir(gt_dir)):
            name = os.path.splitext(fname)[0]
            mesh = os.path.join(cat_dir, name, f"{name}.obj")
            orig = os.path.join(cat_dir, name, f"{name}_trajectory.txt")
            truth = simulate_program(mesh, orig).reshape(-1, 3).mean(1)
            pred = simulate_program(
                mesh, os.path.join(pred_dir, fname)).reshape(-1, 3).mean(1)
            p = coverage_for_pair(truth, pred, percentile=rec.get(
                "percentile", 10))
            per_item[name] = round(float(p), 4)
            covs.append(p)
        rows.append(dict(
            category=category, base_tag=rec["tag"],
            confidence_threshold=thr,
            pred_coverage=round(float(np.mean(covs)), 4),
            pred_coverage_min=round(float(np.min(covs)), 4),
            per_item=per_item, run_dir=run_dir,
            epochs=rec["epochs"], n_train=rec["n_train"],
            wall_sec=round(time.time() - t0, 1),
        ))
        print(f"[sweep {rec['tag']} thr={thr}] "
              f"pred_cov={rows[-1]['pred_coverage']:.4f} "
              f"min={rows[-1]['pred_coverage_min']:.4f}", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["augmfull", "augmhero", "sweep", "all",
                             "shelvesfix", "normhybrid", "scalehero"])
    ap.add_argument("--n_train", type=int, default=192,
                    help="scalehero train-set size")
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "coverage_r4.jsonl"))
    ap.add_argument("--sweep_tags", nargs="*", default=None,
                    help="restrict the sweep stage to these base tags")
    ap.add_argument("--cats", nargs="*", default=None,
                    help="restrict the train stages to these categories")
    args = ap.parse_args()

    def wanted(cat):
        return args.cats is None or cat in args.cats

    if args.stage in ("augmfull", "all"):
        for cat in ("shelves-v2", "cuboids-v2", "windows-v2",
                    "containers-v2"):
            if not wanted(cat):
                continue
            t0 = time.time()
            s = run_category(cat, base_args())
            record(args.out, f"augmfull_{cat}", s, t0)

    if args.stage in ("augmhero", "all"):
        for cat in ("windows-v2", "shelves-v2", "containers-v2"):
            if not wanted(cat):
                continue
            t0 = time.time()
            s = run_category(cat, base_args(epochs=4800, n_train=96))
            record(args.out, f"augmhero_{cat}", s, t0)

    if args.stage == "shelvesfix":
        # VERDICT item 4 at the 2400/48 budget. Diagnosis from the
        # augmfull_shelves dumps: the low-coverage items are exactly the
        # under-counted ones (5 predicted strokes vs 7 GT; the missing
        # masks' confidences are 0.01-0.15, unrecoverable by threshold).
        # The compressed curriculum maps the reference's masks-loss start
        # (3200/4800 = 2/3) to epoch 1600 of 2400, leaving the mask head
        # 800 epochs. Give it half the budget instead (start at ep//2),
        # the same absolute 1200-epoch mask-head training the full-x
        # budget provides proportionally more of.
        t0 = time.time()
        a = base_args()
        a.overrides = [f"start_stroke_masks_loss_at={a.epochs // 2}"]
        s = run_category("shelves-v2", a)
        record(args.out, "shelvesfix_maskstart_shelves-v2", s, t0)

    if args.stage == "normhybrid":
        # VERDICT item 5 convergence evidence: the per-level hybrid norm
        # (fused Pallas train path at sa1/sa2, reference BatchNorm at the
        # final levels) head-to-head vs the r3 `full_*` rows (same budget,
        # no augmentation). Chosen spec from the hardware bench
        # (scripts/tpu_bench_hybrid_norm.py, v5e flagship batch-64):
        # layer+layer+batch 37.8 ms f32 / 28.4 bf16 — within noise of the
        # all-layer fused path (37.4/28.5) while keeping BatchNorm where
        # it is cheapest to keep; all-batch measures 46.9/32.8. norm=layer
        # alone lost badly on shelves (docs/coverage.md); the hybrid must
        # not.
        for cat in ("shelves-v2", "cuboids-v2", "windows-v2",
                    "containers-v2"):
            if not wanted(cat):
                continue
            t0 = time.time()
            s = run_category(cat, base_args(
                augment=False, norm="layer+layer+batch"))
            record(args.out, f"normhybrid_{cat}", s, t0)

    if args.stage == "scalehero":
        # Coverage tracks held-out regression accuracy (diagnosis on the
        # augmhero_windows dumps: uncovered faces are diffuse, all receive
        # paint, mean thickness 32% under threshold — fine positional
        # error, flux ~ 1/d^2, not missing strokes or bad orientations).
        # The strongest measured lever is train-set size (+6 pts from
        # 48->96 at 1200 ep). Epoch-as-one-dispatch makes the data axis
        # cheap on TPU: n=192 at the hero budget is ~20 min/category.
        for cat in ("cuboids-v2", "windows-v2", "shelves-v2",
                    "containers-v2"):
            if not wanted(cat):
                continue
            t0 = time.time()
            s = run_category(cat, base_args(
                epochs=4800, n_train=args.n_train))
            record(args.out, f"scalehero{args.n_train}_{cat}", s, t0)

    if args.stage in ("sweep", "all"):
        recs = []
        if os.path.exists(args.out):
            with open(args.out) as fh:
                recs = [json.loads(l) for l in fh if l.strip()]
        for rec in recs:
            if "confidence_threshold" in rec:
                continue  # already a sweep row
            if args.sweep_tags and rec["tag"] not in args.sweep_tags:
                continue
            for row in sweep_thresholds(rec):
                row["tag"] = f"sweep_{row['base_tag']}"
                with open(args.out, "a") as fh:
                    fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
