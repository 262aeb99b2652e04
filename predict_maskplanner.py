"""One-shot serving driver: OBJ meshes -> executable robot programs.

The production inference path this framework adds beyond the reference's
dataset-bound eval flow (reference ``test_maskplanner.py`` dumps ->
``standalone/from_pred_to_offline_v2.py``): point it at a trained run and
any mesh files, get ``;``-separated X;Y;Z;A;B;C;strokeId programs.

    # predict programs for arbitrary meshes
    python predict_maskplanner.py --run RUN_DIR --model best \\
        --meshes a.obj b.obj --out predicted_programs

    # AOT-export the compiled forward as a StableHLO artifact
    python predict_maskplanner.py --run RUN_DIR --export flagship.hlo \\
        [--platforms tpu cpu]

    # serve from the artifact (weights folded in; model code not rebuilt)
    python predict_maskplanner.py --run RUN_DIR --from_export flagship.hlo \\
        --meshes a.obj --out predicted_programs
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from maskplanner_tpu.serve import Predictor, load_exported


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True, help="trained run directory")
    p.add_argument("--model", default="last",
                   help="checkpoint: best | last | intermediate_epochN")
    p.add_argument("--meshes", nargs="*", default=[],
                   help="OBJ mesh files to predict programs for")
    p.add_argument("--out", default="predicted_programs")
    p.add_argument("--no_postprocess", action="store_true",
                   help="dump raw predicted segments instead of the "
                        "concatenated/resampled strokes")
    p.add_argument("--data_scale_factor", type=float, default=None)
    p.add_argument("--dtype", choices=["bf16", "f32", "train"],
                   default="bf16",
                   help="forward compute dtype. bf16 is the serving "
                        "default (measured consistently faster: 6141 vs "
                        "5523 pc/s at batch 64, docs/bench_r5_clean.json; "
                        "traj rel-err ~7e-3). 'train' keeps the run's "
                        "training dtype")
    p.add_argument("--export", default=None,
                   help="write the compiled forward as a serialized "
                        "StableHLO artifact and exit (unless --meshes)")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering platforms for --export (e.g. tpu cpu)")
    p.add_argument("--from_export", default=None,
                   help="serve the forward from an exported artifact")
    return p.parse_args()


def main():
    args = parse_args()
    pred = Predictor(args.run, model=args.model,
                     data_scale_factor=args.data_scale_factor,
                     compute_dtype=None if args.dtype == "train"
                     else args.dtype)
    print(f"Loaded {args.model} (epoch {pred.epoch}) | "
          f"pc_points={pred.pc_points} scale={pred.scale:.4f}")

    if args.export:
        blob = pred.export_compiled(args.export, platforms=args.platforms)
        print(f"exported compiled forward -> {args.export} "
              f"({len(blob)} bytes, platforms="
              f"{args.platforms or ['current backend']})")

    if args.from_export:
        from maskplanner_tpu.models.maskplanner import MaskPlannerOutput

        raw = load_exported(args.from_export)
        pred._forward = lambda state, pc: MaskPlannerOutput(*raw(pc))
        print(f"serving forward from artifact {args.from_export}")

    for mesh in args.meshes:
        name = os.path.splitext(os.path.basename(mesh))[0]
        out_path = os.path.join(args.out, f"{name}.txt")
        pred.save_program(mesh, out_path,
                          postprocess=not args.no_postprocess)
        rows = np.genfromtxt(out_path, delimiter=";", skip_header=1)
        n_strokes = len(np.unique(rows[:, 6])) if rows.size else 0
        print(f"{name}: {rows.shape[0]} poses, {n_strokes} strokes "
              f"-> {out_path}")

    if not args.meshes and not args.export:
        print("nothing to do: pass --meshes and/or --export")


if __name__ == "__main__":
    main()
