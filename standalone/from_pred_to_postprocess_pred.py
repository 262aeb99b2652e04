"""Apply the full postprocess to saved predictions for offline metrics.

Reference: ``standalone/from_pred_to_postprocess_pred.py`` (the reference
version is unfinished — ends at a pdb trace; this one writes the
postprocessed predictions as ``<model>_<split>_batch<i>_postprocessed.npy``).

    python standalone/from_pred_to_postprocess_pred.py --run RUN_DIR
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maskplanner_tpu.utils.config import load_config
from maskplanner_tpu.postprocess import process_pred_stroke_masks_to_stroke_ids
from maskplanner_tpu.postprocess.segments import process_stroke_segments


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True)
    p.add_argument("--split", default="test", choices=["train", "test"])
    p.add_argument("--model", default="last")
    p.add_argument("--cover_all", action="store_true",
                   help="split off-Edmonds-path segments into sub-strokes "
                        "instead of dropping them (round-5 coverage fix)")
    args = p.parse_args()

    config = load_config(args.run)
    files = sorted(glob.glob(os.path.join(
        args.run, "results", f"{args.model}_{args.split}_batch*.npy")))
    assert files, f"no dumps found under {args.run}/results"

    for path in files:
        dump = np.load(path, allow_pickle=True).item()
        ids_pred = process_pred_stroke_masks_to_stroke_ids(
            dump["pred_stroke_masks"], dump["stroke_masks_scores"])
        trajs, ids = process_stroke_segments(dump["traj_pred"], ids_pred,
                                             config,
                                             cover_all=args.cover_all)
        out = {
            "dirnames": dump["dirnames"],
            "traj_pred_postprocessed": np.array(trajs, dtype=object),
            "stroke_ids_pred_postprocessed": np.array(ids, dtype=object),
            "n_strokes": dump["n_strokes"],
        }
        out_path = path.replace(".npy", "_postprocessed.npy")
        np.save(out_path, out)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
