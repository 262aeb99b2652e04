"""Paint-coverage metric from per-face simulator thickness feedback.

Reference: ``standalone/compute_paint_coverage_per_face.py`` — the paper's
">99% coverage" metric. Input: directories of ``;``-separated CSVs with
one thickness value per face-vertex (3·N rows for N faces). A face counts
as GT-covered when its mean-vertex thickness clears the GT's p-th
percentile (default 10) over non-zero faces; coverage = fraction of
GT-covered faces also covered in the prediction.

    python standalone/compute_paint_coverage_per_face.py \
        --gt-run gt_dir --runs pred_dir1 pred_dir2 [--percentile 10]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--runs", default=[], nargs="+", required=True)
    p.add_argument("--gt-run", dest="gt_run", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--percentile", type=int, default=None)
    return p.parse_args()


def get_thicknesses_values_per_face(path: str) -> np.ndarray:
    """CSV of 3·N per-vertex thicknesses -> N per-face means
    (reference :141-176)."""
    values = np.genfromtxt(path, delimiter=";", dtype=np.float64)
    if values.ndim == 2:
        values = values[:, 1]
    assert values.shape[0] % 3 == 0, "expected 3 vertex rows per face"
    return values.reshape(-1, 3).mean(axis=1)


def coverage_for_pair(gt_faces: np.ndarray, pred_faces: np.ndarray,
                      percentile: int,
                      threshold: float | None = None) -> float:
    """Pass the precomputed GT threshold from the caller to avoid
    re-sorting per prediction run."""
    nonzero = ~np.isclose(gt_faces, 0.0)
    if not nonzero.any():
        raise ValueError("GT thickness file has no painted faces "
                         "(all-zero); coverage is undefined")
    if threshold is None:
        threshold = np.percentile(gt_faces[nonzero], percentile)
    covered = nonzero & (gt_faces >= threshold)
    n_gt = int(covered.sum())
    n_pred = int((pred_faces[covered] >= threshold).sum())
    return n_pred / max(n_gt, 1)


def main():
    args = parse_args()
    percentile = args.percentile if args.percentile is not None else 10
    if args.percentile is None:
        print(f"WARNING! --percentile not set; defaulting to {percentile}")

    items = sorted(f for f in os.listdir(args.gt_run)
                   if os.path.isfile(os.path.join(args.gt_run, f)))
    coverages = [[] for _ in args.runs]
    for item in items:
        gt_faces = get_thicknesses_values_per_face(
            os.path.join(args.gt_run, item))
        assert np.all(gt_faces >= 0.0)
        nonzero = ~np.isclose(gt_faces, 0.0)
        assert nonzero.any(), f"{item}: all-zero GT thickness"
        threshold = np.percentile(gt_faces[nonzero], percentile)
        print(f"\n--- Mesh: {item} | faces: {len(gt_faces)} | "
              f"zero-thickness: {int((~nonzero).sum())} | "
              f"p{percentile} threshold: {threshold:.2f}")
        for i, run in enumerate(args.runs):
            pred_path = os.path.join(run, item)
            assert os.path.isfile(pred_path), f"missing {pred_path}"
            pred_faces = get_thicknesses_values_per_face(pred_path)
            cov = coverage_for_pair(gt_faces, pred_faces, percentile,
                                    threshold=threshold)
            print(f"> run {i} ---> coverage: {cov * 100:.2f}%")
            coverages[i].append(cov)

    coverages = np.array(coverages)
    print("\n======== FINAL RESULTS ========")
    print("RUNS ORDER:\n", args.runs)
    print(f"FINAL MEAN COVERAGES:\n {np.round(coverages.mean(1) * 100, 2)}%")
    print(f"FINAL ST.DEV COVERAGES:\n {np.round(coverages.std(1) * 100, 2)}%")
    return coverages


if __name__ == "__main__":
    main()
