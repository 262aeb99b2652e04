"""Render docs tables from the round-4/5 coverage program records.

Reads docs/coverage_r4.jsonl (written by scripts/coverage_program_r4.py)
and docs/coverage_r3.jsonl (the round-3 baselines) and emits markdown:

  1. augmented full-budget table (augmfull_* vs the r3 full_* rows)
  2. hero-point progression (r3 hero/augmhero + r4 augmhero/scalehero)
  3. confidence-threshold sweep table (sweep_* rows grouped per base
     run, the recorded 0.5 operating point inline with its sweep block)
  4. shelves operating-point rows (VERDICT r3 item 4)

With --write, splices the rendered tables into docs/coverage.md between
the `<!-- R4_TABLES -->` and `<!-- /R4_TABLES -->` markers (idempotent;
the end marker is added at EOF if missing).

Usage: python scripts/coverage_report_r4.py [--jsonl docs/coverage_r4.jsonl]
           [--write [docs/coverage.md]]
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path):
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def by_tag_checked(rows, label):
    """tag -> row, keeping the LAST row per tag and warning about any
    shadowed earlier rows (appended re-runs must not silently rewrite
    tables — ADVICE r4)."""
    out = {}
    for r in rows:
        if "tag" not in r or "confidence_threshold" in r:
            continue
        if r["tag"] in out:
            print(f"WARNING: duplicate tag {r['tag']!r} in {label}: "
                  f"keeping the last row (cov "
                  f"{out[r['tag']]['pred_coverage']} shadowed by "
                  f"{r['pred_coverage']})", file=sys.stderr)
        out[r["tag"]] = r
    return out


def pct(x):
    return f"{100 * x:.1f}%" if x is not None else "—"


def cov_cell(rec):
    return (f"**{pct(rec['pred_coverage'])} / "
            f"{pct(rec.get('pred_coverage_min'))}**")


def render(r4_path, r3_path):
    r4 = load(r4_path)
    r3 = load(r3_path)
    by_tag = by_tag_checked(r4, os.path.basename(r4_path))
    r3_by_tag = by_tag_checked(r3, os.path.basename(r3_path))

    cats = ("cuboids-v2", "windows-v2", "shelves-v2", "containers-v2")
    out = io.StringIO()
    w = lambda *a: print(*a, file=out)

    w("**Augmented full budget** (2400 ep, 48/8, "
      "`pc_online_subsampling`) vs the round-3 plain rows:\n")
    w("| category | r3 plain cov (mean/min) | r4 augmented "
      "(mean/min) | MAE_NoP |")
    w("|---|---|---|---|")
    for c in cats:
        a = by_tag.get(f"augmfull_{c}")
        p = r3_by_tag.get(f"full_{c}")
        if not (a or p):
            continue
        w(f"| {c} | "
          f"{cov_cell(p) if p else '—'} | "
          f"{cov_cell(a) if a else '—'} | "
          f"{a.get('test_mae_nop', '—') if a else '—'} |")

    w("\n**Hero-point progression** (4800 epochs; n_train as shown):\n")
    w("| run | n_train | category | held-out cov (mean/min) | "
      "MAE_NoP |")
    w("|---|---|---|---|---|")
    seen = set()
    for src, prefix in ((r3_by_tag, "hero_"), (r3_by_tag, "augmhero_"),
                        (by_tag, "augmhero_"), (by_tag, "scalehero")):
        for tag, rec in sorted(src.items()):
            if tag.startswith(prefix) and (tag, id(src)) not in seen:
                seen.add((tag, id(src)))
                label = tag.rsplit("_", 1)[0]
                w(f"| {label} | {rec['n_train']} | {rec['category']} | "
                  f"{cov_cell(rec)} | {rec.get('test_mae_nop', '—')} |")

    sweeps = [r for r in r4 if "confidence_threshold" in r]
    if sweeps:
        w("\n**Postprocess confidence-threshold sweep** "
          "(no retraining; 0.5 = the recorded run):\n")
        w("| base run | thr | held-out cov (mean/min) |")
        w("|---|---|---|")
        base_tags = []
        for r in sweeps:
            if r["base_tag"] not in base_tags:
                base_tags.append(r["base_tag"])
        for bt in base_tags:
            rows = [r for r in sweeps if r["base_tag"] == bt]
            base = by_tag.get(bt)
            merged = sorted(
                rows + ([dict(base, confidence_threshold=0.5,
                              base_tag=bt)] if base else []),
                key=lambda r: r["confidence_threshold"])
            for r in merged:
                w(f"| {bt} | {r['confidence_threshold']} | "
                  f"{cov_cell(r)} |")

    shelves = [v for v in by_tag.values()
               if v.get("category") == "shelves-v2"]
    if shelves:
        w("\n**shelves-v2 operating points** (VERDICT r3 item 4 — "
          "target ≥93% mean, ≥85% min):\n")
        w("| run | epochs | n_train | cov (mean/min) | MAE_NoP | "
          "pred/GT strokes |")
        w("|---|---|---|---|---|---|")
        for r in shelves:
            w(f"| {r['tag']} | {r['epochs']} | {r['n_train']} | "
              f"{cov_cell(r)} | {r.get('test_mae_nop', '—')} | "
              f"{r.get('test_avg_pred_strokes', '—')}/"
              f"{r.get('test_avg_gt_strokes', '—')} |")

    return out.getvalue()


def splice(doc_path, text, begin="<!-- R4_TABLES -->",
           end="<!-- /R4_TABLES -->"):
    with open(doc_path) as fh:
        doc = fh.read()
    assert begin in doc, f"{begin} marker not found in {doc_path}"
    head, rest = doc.split(begin, 1)
    tail = rest.split(end, 1)[1] if end in rest else ""
    new = f"{head}{begin}\n\n{text.rstrip()}\n\n{end}{tail}"
    with open(doc_path, "w") as fh:
        fh.write(new if new.endswith("\n") else new + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl",
                    default=os.path.join(REPO, "docs", "coverage_r4.jsonl"))
    ap.add_argument("--r3_jsonl",
                    default=os.path.join(REPO, "docs", "coverage_r3.jsonl"))
    ap.add_argument("--write", nargs="?", const=os.path.join(
        REPO, "docs", "coverage.md"), default=None,
        help="splice tables into this doc between the R4_TABLES markers")
    args = ap.parse_args()

    text = render(args.jsonl, args.r3_jsonl)
    if args.write:
        splice(args.write, text)
        print(f"wrote tables into {args.write}", file=sys.stderr)
    else:
        print(text, end="")


if __name__ == "__main__":
    main()
