"""Export run predictions to the offline spray-paint simulator format.

Reference: ``standalone/from_pred_to_offline_v2.py`` — converts saved
``.npy`` prediction dumps into per-object ``<name>.txt`` robot programs
(``;``-separated, X;Y;Z;A;B;C;strokeId with Euler angles), denormalized to
the original workspace scale, for both GT and predictions.

    python standalone/from_pred_to_offline_v2.py --run RUN_DIR \
        [--output_dir predicted_programs] [--postprocess]
        [--segments_filtering_only] [--custom_data_scale_factor F]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maskplanner_tpu.utils.config import load_config
from maskplanner_tpu.data.io import (
    get_dataset_downscale_factor,
    get_dataset_name,
    orientnorm_to_euler,
    save_traj_file,
)
from maskplanner_tpu.data.pointcloud import (
    denormalize_traj,
    from_seq_to_pc,
    get_dim_traj_points,
)
from maskplanner_tpu.postprocess import process_pred_stroke_masks_to_stroke_ids
from maskplanner_tpu.postprocess.segments import process_stroke_segments


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True)
    p.add_argument("--output_dir", default="predicted_programs")
    p.add_argument("--split", default="test", choices=["train", "test"])
    p.add_argument("--model", default="last")
    p.add_argument("--postprocess", action="store_true")
    p.add_argument("--segments_filtering_only", action="store_true")
    p.add_argument("--no_interpolation", action="store_true")
    p.add_argument("--cover_all", action="store_true",
                   help="split off-Edmonds-path segments into sub-strokes "
                        "instead of dropping them (round-5 coverage fix; "
                        "default preserves reference drop behavior, "
                        "utils/cluster.py:83-89)")
    p.add_argument("--custom_data_scale_factor", type=float, default=None)
    p.add_argument("--confidence_threshold", type=float, default=0.5,
                   help="stroke-mask confidence filter (reference "
                        "utils/postprocessing.py:126-131 DETR-style "
                        "threshold; sweepable offline on saved dumps)")
    p.add_argument("--force_overwrite", action="store_true")
    return p.parse_args()


def _to_points(traj_rows, ids_rows, extra_data):
    """Per-sample segment rows (−100 padded) -> (points, per-point ids)."""
    outdim = get_dim_traj_points(extra_data)
    valid = ~np.all(traj_rows == -100.0, axis=-1)
    rows, ids = traj_rows[valid], np.asarray(ids_rows)[valid]
    lam = rows.shape[-1] // outdim
    pts = rows.reshape(-1, outdim)
    return pts, np.repeat(ids, lam)


def main():
    args = parse_args()
    config = load_config(args.run)
    category = get_dataset_name(config["dataset"])
    extra_data = config["extra_data"]
    assert config["normalization"] == "per-dataset"

    scale = (args.custom_data_scale_factor
             or config.get("data_scale_factor")
             or get_dataset_downscale_factor(category) or 1.0)

    files = sorted(glob.glob(os.path.join(
        args.run, "results", f"{args.model}_{args.split}_batch*.npy")))
    assert files, f"no dumps found in {args.run}/results"

    gt_dir = os.path.join(args.output_dir, f"gt_{category}")
    pred_dir = os.path.join(args.output_dir, f"pred_{category}")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(pred_dir, exist_ok=True)

    for path in files:
        dump = np.load(path, allow_pickle=True).item()
        ids_pred = process_pred_stroke_masks_to_stroke_ids(
            dump["pred_stroke_masks"], dump["stroke_masks_scores"],
            confidence_threshold=args.confidence_threshold)
        if args.postprocess:
            trajs, out_ids = process_stroke_segments(
                dump["traj_pred"], ids_pred, config,
                segments_filtering_only=args.segments_filtering_only,
                no_interpolation=args.no_interpolation,
                cover_all=args.cover_all)
            if args.segments_filtering_only:
                pairs = [
                    _to_points(trajs[b], out_ids[b], extra_data)
                    for b in range(len(trajs))
                ]
            else:
                pairs = list(zip(trajs, out_ids))
        else:
            pairs = [
                _to_points(dump["traj_pred"][b], ids_pred[b], extra_data)
                for b in range(len(ids_pred))
            ]

        for b, name in enumerate(dump["dirnames"]):
            for which, (pts, ids), out_dir in (
                ("gt", _to_points(dump["traj"][b], dump["stroke_ids"][b],
                                  extra_data), gt_dir),
                ("pred", pairs[b], pred_dir),
            ):
                out_path = os.path.join(out_dir, f"{name}.txt")
                if os.path.isfile(out_path) and not args.force_overwrite:
                    continue
                # denormalize to workspace scale (centroid unknown without
                # the source mesh -> exported around the origin, reference
                # re-reads the mesh for the shift)
                pts = denormalize_traj(np.asarray(pts, np.float64),
                                       centroid=np.zeros(3), scale=scale,
                                       weight_orient=config["weight_orient"])
                euler = orientnorm_to_euler(pts[:, 3:6])
                rows = np.concatenate(
                    [pts[:, :3], euler,
                     np.asarray(ids, np.float64)[:, None]], axis=1)
                save_traj_file(rows, out_path, kind="euler")
        print(f"exported batch {os.path.basename(path)}")

    print(f"programs written to {gt_dir} and {pred_dir}")


if __name__ == "__main__":
    main()
