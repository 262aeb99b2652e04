"""Round-5 coverage program: combined levers + encoder warm start.

VERDICT r4 items 2/3/6. The round-4 single-lever program saturated
(~95-98 cuboids, ~96.5 windows, ~91 shelves, ~93.5 containers); this
program combines the per-category winners and adds the one untried
lever — an in-repo encoder warm start that replicates the reference's
ShapeNet pretrained init (``/root/reference/models/__init__.py:386-426``),
which every previous coverage run silently skipped (random-init warning
in the run logs).

Stages (one TPU job at a time; records append to docs/coverage_r5.jsonl):

  pretrain  — joint-corpus pretraining: one flagship StrokeMasks model
              trained on all four fixture categories at the shared
              coverage shapes (896/448 traj points, 12 masks, scale 800).
              Because every per-category coverage run uses these same
              shapes, the checkpoint is shape-compatible and the existing
              ``model.pretrained_custom`` transfer path
              (train_maskplanner.py:155-175, reference
              init_from_pretrained_custom) loads it directly — encoder +
              trunk + mask heads warm, fc_out/fc_normals re-initialized.
              This replicates the reference's *transfer effect* with an
              in-domain corpus (the reference blob is stripped from its
              checkout; PARITY.md).
  normhybrid — VERDICT r4 item 3: the layer+layer+batch hybrid encoder
              norm at the full-budget point, all four categories,
              head-to-head vs the r3 `full_*` rows. Qualifies the fused
              Pallas train path (a measured ~23% step-time win) for the
              flagship recipe.
  combo     — per-category combined levers, all warm-started:
              cuboids    4800 ep, n=96, augment (the 98.1% recipe + warm)
              windows    4800 ep, n=192, plain (augment hurts windows;
                         scale was its best lever) + thr sweep
              shelves    4800 ep, n=192, augment + maskstart(ep/2) +
                         explicit_no_stroke_weight=0.2 (count-aware
                         down-weighting of no-stroke masks — the round-4
                         diagnosis is under-counted strokes whose missing
                         masks sit at confidence 0.01-0.15)
              containers 4800 ep, n=192, plain + maskstart(ep/2)
  sweep     — offline confidence-threshold sweep on recorded rows
              (CPU-only, no retraining), incl. a best-vs-last checkpoint
              comparison per run.

Usage: python scripts/coverage_program_r5.py --stage pretrain|normhybrid|
                                             combo|sweep [--cats ...]
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
sys.path.insert(0, os.path.join(REPO, "standalone"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cc_cache")

from coverage_study import run_category
from coverage_program_r4 import sweep_thresholds

_SHAPES = dict(traj_points=896, n_pred_traj_points=448)
PRETRAIN_DIR = os.path.join(REPO, "runs", "pretrain_joint_r5")
ALL_CATS = ("cuboids-v2", "windows-v2", "shelves-v2", "containers-v2")


def base_args(**over):
    d = dict(
        epochs=2400, n_train=48, n_test=8, pc_points=2048,
        batch_size=8, percentile=10, split="test",
        seed=7, postprocess=True, bf16=False, norm="batch",
        augment=True, deterministic=True, mesh_edge=0.10, max_n_strokes=12,
        eval_divisor=16, cover_all=True, **_SHAPES,
    )
    d.update(over)
    return SimpleNamespace(**d)


def record(out_path, tag, summary, t0):
    summary = dict(summary)
    summary["tag"] = tag
    summary["wall_sec"] = round(time.time() - t0, 1)
    with open(out_path, "a") as fh:
        fh.write(json.dumps(summary) + "\n")
    print(f"[{tag}] pred_cov={summary.get('pred_coverage', float('nan')):.4f} "
          f"min={summary.get('pred_coverage_min', float('nan')):.4f} "
          f"({summary['wall_sec']}s)", flush=True)


def pretrain_joint(out_path, epochs=2000, n_train=96, pc_points=2048):
    """Train the joint-corpus warm-start checkpoint into PRETRAIN_DIR."""
    import shutil
    import tempfile

    import train_maskplanner
    from maskplanner_tpu.data.fixture_category import write_category
    from maskplanner_tpu.utils.args import load_args

    t0 = time.time()
    tmp = tempfile.mkdtemp(prefix="pretrain_joint_")
    root = os.path.join(tmp, "paintnet")
    for i, cat in enumerate(ALL_CATS):
        write_category(root, cat, n_train=n_train, n_test=4,
                       seed=7 + i, deterministic=True, mesh_max_edge=0.10)
    os.environ["PAINTNET_ROOT"] = root
    try:
        cfg = load_args(argv=[
            "config=[maskplanner,cuboids_v2,longx_v2]",
            "dataset=[%s]" % ",".join(ALL_CATS),
            f"pc_points={pc_points}", f"traj_points={_SHAPES['traj_points']}",
            f"n_pred_traj_points={_SHAPES['n_pred_traj_points']}",
            "max_n_strokes=12",
            "traj_with_equally_spaced_points=false",
            "data_scale_factor=800.0",
            "batch_size=8", f"epochs={epochs}",
            f"eval_freq={max(epochs // 8, 1)}",
            f"lr_sched.step_sizes=[{epochs//5},{epochs//3},{epochs//2},"
            f"{2*epochs//3},{5*epochs//6}]",
            f"psacd_scheduler.milestones=[{epochs//5},{2*epochs//5}]",
            f"start_stroke_masks_loss_at={2 * epochs // 3}",
            "eval_metrics=[pcd,stroke_masks_metrics]",
            "augmentations=[pc_online_subsampling]",
            "seed=7", "no_save=false", f"output_dir={tmp}",
        ])
        run_dir, _ = train_maskplanner.main(cfg)
    finally:
        os.environ.pop("PAINTNET_ROOT", None)

    if os.path.isdir(PRETRAIN_DIR):
        shutil.rmtree(PRETRAIN_DIR)
    os.makedirs(os.path.dirname(PRETRAIN_DIR), exist_ok=True)
    shutil.copytree(run_dir, PRETRAIN_DIR)
    summary = dict(kind="pretrain", categories=list(ALL_CATS),
                   epochs=epochs, n_train=n_train * len(ALL_CATS),
                   run_dir=PRETRAIN_DIR)
    try:
        with open(os.path.join(run_dir, "summary.json")) as fh:
            s = json.load(fh)
        summary["test_pcd"] = s.get("final_test_point-wise chamfer distance")
        summary["test_mae_nop"] = s.get("final_test_mean_absolute_error_NoP")
        summary["tot_train_seconds"] = s.get("tot_train_seconds")
    except (OSError, ValueError):
        pass
    summary["tag"] = "pretrain_joint"
    summary["wall_sec"] = round(time.time() - t0, 1)
    with open(out_path, "a") as fh:
        fh.write(json.dumps(summary) + "\n")
    print(f"[pretrain_joint] done -> {PRETRAIN_DIR} "
          f"({summary['wall_sec']}s)", flush=True)


def warm_overrides():
    assert os.path.isdir(PRETRAIN_DIR), (
        f"run --stage pretrain first ({PRETRAIN_DIR} missing)")
    return [f"model.pretrained_custom={PRETRAIN_DIR}"]


COMBOS = {
    "cuboids-v2": dict(epochs=4800, n_train=96, augment=True),
    "windows-v2": dict(epochs=4800, n_train=192, augment=False),
    "shelves-v2": dict(epochs=4800, n_train=192, augment=True,
                       maskstart=True,
                       extra=["explicit_no_stroke_weight=0.2"]),
    "containers-v2": dict(epochs=4800, n_train=192, augment=False,
                          maskstart=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["pretrain", "normhybrid", "combo", "sweep"])
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "coverage_r5.jsonl"))
    ap.add_argument("--cats", nargs="*", default=None)
    ap.add_argument("--sweep_tags", nargs="*", default=None)
    ap.add_argument("--pretrain_epochs", type=int, default=2000)
    args = ap.parse_args()

    def wanted(cat):
        return args.cats is None or cat in args.cats

    if args.stage == "pretrain":
        pretrain_joint(args.out, epochs=args.pretrain_epochs)

    if args.stage == "normhybrid":
        for cat in ALL_CATS:
            if not wanted(cat):
                continue
            t0 = time.time()
            s = run_category(cat, base_args(
                augment=False, norm="layer+layer+batch"))
            record(args.out, f"normhybrid_{cat}", s, t0)

    if args.stage == "combo":
        for cat in ALL_CATS:
            if not wanted(cat):
                continue
            spec = dict(COMBOS[cat])
            extra = list(spec.pop("extra", []))
            maskstart = spec.pop("maskstart", False)
            a = base_args(**spec)
            ov = warm_overrides() + extra
            if maskstart:
                ov.append(f"start_stroke_masks_loss_at={a.epochs // 2}")
            a.overrides = ov
            t0 = time.time()
            s = run_category(cat, a)
            record(args.out, f"combo_{cat}", s, t0)

    if args.stage == "sweep":
        recs = []
        if os.path.exists(args.out):
            with open(args.out) as fh:
                recs = [json.loads(l) for l in fh if l.strip()]
        for rec in recs:
            if "confidence_threshold" in rec or rec.get("kind") == "pretrain":
                continue
            if args.sweep_tags and rec["tag"] not in args.sweep_tags:
                continue
            for row in sweep_thresholds(rec):
                row["tag"] = f"sweep_{rec['tag']}"
                with open(args.out, "a") as fh:
                    fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
