"""Does the REFERENCE also diverge at batch 2? (bench e2e A/B parity)

Round-5 measured that this repo's flagship model at batch_size=2 (the
reference debug config's batch) has a RISING composite-chamfer loss over
80 epochs (1494->2567) while batch 8 descends (1656->1112) — attributed
to 2-sample BatchNorm statistics. This script runs the SAME experiment
on the reference implementation (CPU torch via tests/ref_harness):
reference PointNet2Regressor_StrokeMasks + reference LossHandler
(asymm_v6 composite, flagship weights, mask terms at their delayed 0.0)
+ Adam(1e-3), fed the identical fixture batches through this repo's
data pipeline.

Usage: JAX_PLATFORMS=cpu python scripts/ref_batch2_check.py
           [--epochs 80] [--batches 2 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def run(batch_size: int, epochs: int, root: str) -> list[float]:
    import torch

    from ref_harness import import_reference, import_reference_models
    from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
    from maskplanner_tpu.utils.args import load_args

    ref = import_reference()
    mod = import_reference_models()
    from omegaconf import DictConfig  # ref_harness installs the stub

    os.environ["PAINTNET_ROOT"] = root
    cfg = load_args(argv=[
        "config=[maskplanner,cuboids_v2,longx_v2,debug]",
        "dataset=cuboids-v2", "pc_points=1024", "traj_points=512",
        "n_pred_traj_points=256", "max_n_strokes=12",
        "traj_with_equally_spaced_points=false",
        "data_scale_factor=800.0", f"batch_size={batch_size}",
        "seed=7",
    ])
    ds = PaintDataset(cfg, split="train")
    loader = DataLoader(ds, batch_size, shuffle=True, seed=7,
                        drop_last=True)

    lam, overlap = int(cfg["lambda_points"]), int(cfg["overlapping"])
    # reference io sizing (models/__init__.py:297-318):
    # traj_with_equally_spaced_points=false -> out_vectors from
    # traj_points; per-vector dims are lambda x (transl, orient)
    out_vectors = (int(cfg["traj_points"]) - lam) // (lam - overlap) + 1
    torch.manual_seed(7)
    model = mod.PointNet2Regressor_StrokeMasks(
        outdim=3 * lam, outdim_orient=3 * lam,
        weight_orient=float(cfg["weight_orient"]),
        out_vectors=out_vectors, hidden_size=[1024, 1024],
        pred_stroke_masks=True, n_stroke_masks=int(cfg["max_n_strokes"]),
        mask_confidence_scores=True, segment_confidence_scores=False)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    ref_cfg = DictConfig(dict(
        extra_data=["orientnorm"], lambda_points=lam,
        stroke_pred=False, min_centroids=False,
        per_segment_confidence=False, smooth_target_stroke_masks=False,
        knn_repulsion=3, rep_target=None,
        weight_asymm_v6_chamfer_with_stroke_masks=1.0,
        weight_asymm_segment_chamfer=float(
            cfg["weight_asymm_segment_chamfer"]),
        weight_reverse_asymm_point_chamfer=float(
            cfg["weight_reverse_asymm_point_chamfer"]),
        weight_reverse_asymm_segment_chamfer=float(
            cfg["weight_reverse_asymm_segment_chamfer"]),
        # delayMasksLoss: mask terms start at 0.0 (never activate in
        # this 80-epoch window under the longx curriculum)
        explicit_weight_stroke_masks=0.0,
        explicit_weight_stroke_masks_confidence=0.0,
        explicit_no_stroke_weight=1.0,
        explicit_weight_segments_confidence=0.0,
    ))
    handler = ref.loss_handler.LossHandler(
        ["asymm_v6_chamfer_with_stroke_masks"], config=ref_cfg)

    losses = []
    for ep in range(epochs):
        ep_losses = []
        for batch in loader:
            pc = torch.from_numpy(
                np.asarray(batch["point_cloud"], np.float32)).permute(
                    0, 2, 1)
            y = torch.from_numpy(np.asarray(batch["traj"], np.float32))
            ids = torch.from_numpy(np.asarray(batch["stroke_ids"]))
            tpc = torch.from_numpy(
                np.asarray(batch["traj_as_pc"], np.float32))
            out, sm_out, conf, _ = model(pc)
            total, _ = handler.compute(
                y_pred=out, y=y, stroke_ids=ids, traj_as_pc=tpc,
                pred_stroke_masks=sm_out, mask_scores=conf,
                seg_logits=None)
            opt.zero_grad()
            total.backward()
            opt.step()
            ep_losses.append(float(total.detach()))
        losses.append(float(np.mean(ep_losses)))
        if ep % 10 == 0 or ep == epochs - 1:
            print(f"  [bs={batch_size}] epoch {ep}: {losses[-1]:.1f}",
                  flush=True)
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 2])
    args = ap.parse_args()

    from maskplanner_tpu.data.fixture_category import write_category

    tmp = tempfile.mkdtemp(prefix="ref_b2_")
    root = os.path.join(tmp, "paintnet")
    write_category(root, "cuboids-v2", n_train=8, n_test=2, seed=7,
                   deterministic=True)

    for bs in args.batches:
        t0 = time.time()
        losses = run(bs, args.epochs, root)
        tail = float(np.mean(losses[-10:]))
        print(f"REFERENCE bs={bs}: first {losses[0]:.0f} "
              f"tail(mean last 10) {tail:.0f} "
              f"improved={tail < losses[0]} ({time.time() - t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
