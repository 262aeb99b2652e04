"""Which postprocess stage destroys floor-item coverage? (VERDICT r4 #6)

floor_rootcause_r5.py showed every category's floor item is
postprocess-caused (raw export 94-100% vs 73-89% postprocessed). This
tool ablates the pipeline per item on the saved dumps (CPU-only):

  raw       — segments as-is with mask-derived stroke ids
  filter    — + greedy duplicate-segment suppression only
  concat    — skip filtering; Edmonds concat + trim + resample + smooth
  full      — filter + concat (the recorded operating point)
  noresample— filter + concat order, but poses kept as predicted
              (trim/resample/smooth skipped)

Usage:
  python scripts/postprocess_ablation_r5.py --jsonl docs/coverage_r4.jsonl \
      --pairs scalehero192_cuboids-v2:box_199 ...
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "standalone"))


def export_points(traj_rows, ids_rows, outdim):
    valid = ~np.all(traj_rows == -100.0, axis=-1)
    rows, ids = traj_rows[valid], np.asarray(ids_rows)[valid]
    pts = rows.reshape(-1, outdim)
    return pts, np.repeat(ids, rows.shape[-1] // outdim)


def save_program(path, pts, ids, scale, weight_orient):
    from maskplanner_tpu.data.io import orientnorm_to_euler, save_traj_file
    from maskplanner_tpu.data.pointcloud import denormalize_traj

    pts = denormalize_traj(np.asarray(pts, np.float64),
                           centroid=np.zeros(3), scale=scale,
                           weight_orient=weight_orient)
    euler = orientnorm_to_euler(pts[:, 3:6])
    rows = np.concatenate([pts[:, :3], euler,
                           np.asarray(ids, np.float64)[:, None]], axis=1)
    save_traj_file(rows, path, kind="euler")


def item_variants(rec, item):
    """Return {variant: coverage} for one held-out item."""
    from compute_paint_coverage_per_face import coverage_for_pair
    from maskplanner_tpu.sim import simulate_program
    from maskplanner_tpu.utils.config import load_config
    from maskplanner_tpu.postprocess import (
        process_pred_stroke_masks_to_stroke_ids)
    from maskplanner_tpu.postprocess.segments import (
        filter_overlapping_segments, process_stroke_segments)
    from maskplanner_tpu.data.pointcloud import get_dim_traj_points

    run_dir = rec["run_dir"]
    tmp = os.path.dirname(run_dir)
    cat = rec["category"]
    cat_dir = os.path.join(tmp, "paintnet", cat)
    mesh = os.path.join(cat_dir, item, f"{item}.obj")
    orig = os.path.join(cat_dir, item, f"{item}_trajectory.txt")
    config = load_config(run_dir)
    outdim = get_dim_traj_points(config["extra_data"])
    scale = float(config.get("data_scale_factor") or 800.0)

    # locate the dump containing the item
    dump = b = None
    for path in sorted(glob.glob(os.path.join(
            run_dir, "results", f"last_{rec['split']}_batch*.npy"))):
        d = np.load(path, allow_pickle=True).item()
        if item in list(d["dirnames"]):
            dump, b = d, list(d["dirnames"]).index(item)
            break
    assert dump is not None, f"{item} not in dumps of {run_dir}"

    ids_pred = process_pred_stroke_masks_to_stroke_ids(
        dump["pred_stroke_masks"], dump["stroke_masks_scores"])
    traj_pred = np.asarray(dump["traj_pred"], np.float64)

    truth = simulate_program(mesh, orig).reshape(-1, 3).mean(1)
    perc = rec.get("percentile", 10)

    out_dir = os.path.join(tmp, "ablation_programs")
    os.makedirs(out_dir, exist_ok=True)

    def score(tag, pts, ids):
        prog = os.path.join(out_dir, f"{item}_{tag}.txt")
        save_program(prog, pts, ids, scale,
                     float(config["weight_orient"]))
        pred = simulate_program(mesh, prog).reshape(-1, 3).mean(1)
        return float(coverage_for_pair(truth, pred, percentile=perc))

    res = {}
    res["raw"] = score("raw", *export_points(traj_pred[b], ids_pred[b],
                                             outdim))

    ft, fi = filter_overlapping_segments(traj_pred[b:b + 1].copy(),
                                         ids_pred[b:b + 1].copy())
    res["filter"] = score("filter", *export_points(ft[0], fi[0], outdim))

    trajs, out_ids = process_stroke_segments(
        traj_pred[b:b + 1], ids_pred[b:b + 1], config,
        skip_segments_filtering=True)
    res["concat"] = score("concat", trajs[0], out_ids[0])

    trajs, out_ids = process_stroke_segments(
        traj_pred[b:b + 1], ids_pred[b:b + 1], config)
    res["full"] = score("full", trajs[0], out_ids[0])

    trajs, out_ids = process_stroke_segments(
        traj_pred[b:b + 1], ids_pred[b:b + 1], config,
        no_interpolation=True)
    res["full_nointerp"] = score("full_nointerp", trajs[0], out_ids[0])

    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", default=os.path.join(
        REPO, "docs", "coverage_r4.jsonl"))
    ap.add_argument("--pairs", nargs="+", required=True)
    args = ap.parse_args()

    recs = {}
    with open(args.jsonl) as fh:
        for line in fh:
            r = json.loads(line)
            if "tag" in r and "confidence_threshold" not in r:
                recs[r["tag"]] = r

    for pair in args.pairs:
        tag, item = pair.split(":")
        res = item_variants(recs[tag], item)
        print(json.dumps({"tag": tag, "item": item, **{
            k: round(v, 4) for k, v in res.items()}}), flush=True)


if __name__ == "__main__":
    main()
