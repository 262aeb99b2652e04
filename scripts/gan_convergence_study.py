"""GAN convergence study (CPU-friendly, tiny shapes).

The reference trains its discriminators inside the loss call with no
recorded convergence evidence (loss_handler.py:259-375). This study runs
the full GAN training driver on deterministic synthetic data and records
the generator/adversarial loss curves so regressions in the adversarial
game (D trivially winning, G diverging, gradient-penalty blowups) are
visible. Emits one JSON line per epoch plus a summary verdict.

Usage: JAX_PLATFORMS=cpu python scripts/gan_convergence_study.py [--kind
wdiscriminator|discriminator] [--epochs 40]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", default="wdiscriminator",
                    choices=["wdiscriminator", "discriminator"])
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--out", default=None, help="run dir (default: tmp)")
    args = ap.parse_args()

    import jax

    if jax.default_backend() not in ("cpu",):
        pass  # runs anywhere; CPU is enough for the tiny shapes

    import train_maskplanner
    from maskplanner_tpu.utils.args import load_args

    out = args.out or tempfile.mkdtemp(prefix="gan_study_")
    # GAN losses are only compatible with single-pose vectors (the
    # reference's lambda1 recipe; compat asserts loss_handler.py:176-209)
    cfg = load_args(argv=[
        "config=[maskplanner,cuboids_v2,longx_v2,debug]",
        f"loss=[chamfer,{args.kind}]",
        "lambda_points=1", "overlapping=0",
        "weight_chamfer=1.0", f"weight_{args.kind}=0.1",
        "pc_points=64", "n_pred_traj_points=80", "batch_size=4",
        f"epochs={args.epochs}", f"eval_freq={args.epochs}",
        "dataset_size=8", "test_dataset_size=2", "seed=1",
        f"output_dir={out}",
    ])
    run_dir, _ = train_maskplanner.main(cfg)

    logs = [json.loads(l) for l in open(os.path.join(run_dir, "logs.jsonl"))]
    curve = [(l["epoch"], l["train_loss"],
              l.get(f"{args.kind}_train_loss"),
              l.get("d_internal_train_loss"))
             for l in logs if "train_loss" in l]
    for ep, total, adv, d_loss in curve:
        print(json.dumps({"epoch": ep, "train_loss": total,
                          "adv_term": adv, "d_loss": d_loss}))

    import numpy as np

    totals = np.array([c[1] for c in curve], dtype=np.float64)
    verdict = {
        "kind": args.kind,
        "epochs": len(totals),
        "finite": bool(np.isfinite(totals).all()),
        "start": float(np.mean(totals[:3])),
        "end": float(np.mean(totals[-3:])),
        "improved": bool(np.mean(totals[-3:]) < np.mean(totals[:3])),
        "run_dir": run_dir,
    }
    print(json.dumps({"summary": verdict}))
    if not verdict["finite"]:
        raise SystemExit("GAN training diverged to NaN/inf")


if __name__ == "__main__":
    main()
