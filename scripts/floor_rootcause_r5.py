"""Root-cause the per-category coverage floors (VERDICT r4 item 6).

Every category's minimum is one or two specific held-out boxes. For each
requested (record tag, item) this script re-simulates the surviving run
artifacts and classifies WHY the item under-covers:

  missing_paint — uncovered faces receive (near-)zero predicted paint:
                  a stroke/region is absent (under-counted strokes or a
                  dropped segment cluster).
  shortfall     — uncovered faces all receive paint but land under the
                  GT thickness threshold: fine positional/flux error
                  (flux ~ 1/d^2), the round-3 "diffuse" diagnosis.
  postprocess   — coverage recovers when the raw (un-postprocessed)
                  prediction is exported: the greedy filter / concat
                  pipeline is discarding good segments.

Per item it reports: coverage, stroke counts (original program vs
exported prediction), the predicted-thickness distribution on the
uncovered faces (fraction near-zero, mean ratio to threshold), coverage
with postprocess disabled, and writes one JSON line per item plus a
markdown table to stdout.

Usage:
  python scripts/floor_rootcause_r5.py --jsonl docs/coverage_r4.jsonl \
      --pairs augmhero_containers-v2:box_098 augmhero_shelves-v2:box_100 \
              scalehero192_cuboids-v2:box_199 \
      [--out docs/floor_rootcause_r5.jsonl]
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
sys.path.insert(0, os.path.join(REPO, "scripts"))


def program_stroke_count(path: str) -> int:
    ids = np.genfromtxt(path, delimiter=";", skip_header=1)[:, -1]
    return int(len(np.unique(ids[np.isfinite(ids)])))


def analyze_item(rec: dict, item: str, thr_override: float | None = None):
    from compute_paint_coverage_per_face import coverage_for_pair
    from maskplanner_tpu.sim import simulate_program

    run_dir = rec["run_dir"]
    tmp = os.path.dirname(run_dir)
    cat = rec["category"]
    cat_dir = os.path.join(tmp, "paintnet", cat)
    progs = os.path.join(tmp, "programs")
    mesh = os.path.join(cat_dir, item, f"{item}.obj")
    orig = os.path.join(cat_dir, item, f"{item}_trajectory.txt")
    pred_prog = os.path.join(progs, f"pred_{cat}", f"{item}.txt")
    gt_prog = os.path.join(progs, f"gt_{cat}", f"{item}.txt")
    assert os.path.isfile(mesh) and os.path.isfile(pred_prog), (mesh,
                                                                pred_prog)

    truth = simulate_program(mesh, orig).reshape(-1, 3).mean(1)
    pred = simulate_program(mesh, pred_prog).reshape(-1, 3).mean(1)

    nonzero = ~np.isclose(truth, 0.0)
    thr = thr_override if thr_override is not None else float(
        np.percentile(truth[nonzero], rec.get("percentile", 10)))
    covered = nonzero & (truth >= thr)
    uncovered = covered & (pred < thr)
    cov = coverage_for_pair(truth, pred, percentile=rec.get(
        "percentile", 10))

    upred = pred[uncovered]
    frac_zero = float((upred < 0.2 * thr).mean()) if upred.size else 0.0
    mean_ratio = float((upred / thr).mean()) if upred.size else 1.0

    # postprocess-off export for the same item (CPU, single item):
    # re-export the whole split without --postprocess into a side dir
    # once per run, then score this item.
    raw_dir = os.path.join(tmp, "programs_rawdump")
    raw_prog = os.path.join(raw_dir, f"pred_{cat}", f"{item}.txt")
    if not os.path.isfile(raw_prog):
        import from_pred_to_offline_v2 as export_tool

        old_argv = sys.argv
        sys.argv = ["from_pred_to_offline_v2.py", "--run", run_dir,
                    "--output_dir", raw_dir, "--model", "last",
                    "--split", rec["split"]]
        try:
            export_tool.main()
        finally:
            sys.argv = old_argv
    pred_raw = simulate_program(mesh, raw_prog).reshape(-1, 3).mean(1)
    cov_raw = coverage_for_pair(truth, pred_raw, percentile=rec.get(
        "percentile", 10))

    n_orig = program_stroke_count(orig)
    n_gt = program_stroke_count(gt_prog)
    n_pred = program_stroke_count(pred_prog)

    # classification: postprocess if the raw export recovers >2 pts;
    # missing_paint if >=25% of uncovered faces get near-zero paint OR a
    # stroke is clearly absent; else shortfall.
    if cov_raw - cov > 0.02:
        label = "postprocess"
    elif frac_zero >= 0.25 or n_pred < n_orig - 1:
        label = "missing_paint"
    else:
        label = "shortfall"

    return dict(
        tag=rec["tag"], item=item, category=cat,
        coverage=round(float(cov), 4),
        coverage_raw_export=round(float(cov_raw), 4),
        n_uncovered_faces=int(uncovered.sum()),
        n_covered_faces=int(covered.sum()),
        uncovered_frac_nearzero=round(frac_zero, 3),
        uncovered_mean_thickness_ratio=round(mean_ratio, 3),
        strokes_original=n_orig, strokes_gt_export=n_gt,
        strokes_pred=n_pred,
        label=label, run_dir=run_dir,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", default=os.path.join(
        REPO, "docs", "coverage_r4.jsonl"))
    ap.add_argument("--pairs", nargs="+", required=True,
                    help="tag:item pairs, e.g. augmhero_shelves-v2:box_100")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    recs = {}
    with open(args.jsonl) as fh:
        for line in fh:
            r = json.loads(line)
            if "tag" in r and "confidence_threshold" not in r:
                recs[r["tag"]] = r

    rows = []
    for pair in args.pairs:
        tag, item = pair.split(":")
        rows.append(analyze_item(recs[tag], item))
        print(json.dumps(rows[-1]), flush=True)
        if args.out:
            with open(args.out, "a") as fh:
                fh.write(json.dumps(rows[-1]) + "\n")

    print("\n| run | item | cov | raw-export cov | strokes orig/gt/pred |"
          " uncovered near-zero | mean thickness/thr | verdict |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['tag']} | {r['item']} | {100*r['coverage']:.1f}% | "
              f"{100*r['coverage_raw_export']:.1f}% | "
              f"{r['strokes_original']}/{r['strokes_gt_export']}/"
              f"{r['strokes_pred']} | "
              f"{100*r['uncovered_frac_nearzero']:.0f}% | "
              f"{r['uncovered_mean_thickness_ratio']:.2f} | "
              f"**{r['label']}** |")


if __name__ == "__main__":
    main()
