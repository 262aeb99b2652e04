"""Run the spray-deposition stand-in over exported robot programs.

Bridges the external-simulator boundary of the reference pipeline
(SURVEY §3.5): consumes the ``<name>.txt`` programs written by
``standalone/from_pred_to_offline_v2.py`` plus the category meshes, and
writes per-face-vertex thickness CSVs in the format expected by
``standalone/compute_paint_coverage_per_face.py`` (3 rows per face).

    python standalone/simulate_spray_thickness.py \
        --programs programs/gt_cat programs/pred_cat \
        --meshes $PAINTNET_ROOT/<category> --out thickness/

then

    python standalone/compute_paint_coverage_per_face.py \
        --gt-run thickness/gt_cat --runs thickness/pred_cat
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maskplanner_tpu.data.io import find_mesh  # noqa: E402
from maskplanner_tpu.sim import simulate_program  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--programs", nargs="+", required=True,
                   help="dirs of <name>.txt robot programs")
    p.add_argument("--meshes", required=True,
                   help="category root holding <name>/<name>.obj "
                        "(or flat <name>.obj)")
    p.add_argument("--out", required=True)
    p.add_argument("--sigma_deg", type=float, default=12.0)
    p.add_argument("--cone_deg", type=float, default=30.0)
    return p.parse_args()


def main():
    args = parse_args()
    for prog_dir in args.programs:
        out_dir = os.path.join(args.out, os.path.basename(
            os.path.normpath(prog_dir)))
        os.makedirs(out_dir, exist_ok=True)
        programs = sorted(glob.glob(os.path.join(prog_dir, "*.txt")))
        assert programs, f"no programs in {prog_dir}"
        for prog in programs:
            name = os.path.splitext(os.path.basename(prog))[0]
            mesh = find_mesh(args.meshes, name)
            simulate_program(mesh, prog,
                             os.path.join(out_dir, f"{name}.txt"),
                             sigma_deg=args.sigma_deg,
                             cone_deg=args.cone_deg)
            print(f"simulated {name} -> {out_dir}")
    print(f"thickness CSVs written under {args.out}")


if __name__ == "__main__":
    main()
