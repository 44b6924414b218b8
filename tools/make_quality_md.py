"""Assemble QUALITY.md from the quality-run artifacts.

Reads (all produced by tools/run_quality.sh):
  <run>/train_log.jsonl                    — training trajectory
  <run>/test_results/test_result.txt       — run_testing PSNR/SSIM/MS-SSIM
  <run>/eval_results.txt                   — per-frame CD/EMD vs gt_eval
  <run>/cfg_args.json                      — recipe snapshot

Writes QUALITY.md at the repo root.  Honest by construction: anything
missing is reported as missing, numbers are quoted with the iteration they
come from, and the training trajectory table shows the mesh phase's actual
shape (the r3/r4 rounds shipped no quality number at all — VERDICT r4 #2).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_log(path):
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return rows


def fmt(v, nd=2):
    return f"{v:.{nd}f}" if isinstance(v, (int, float)) else str(v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="output/quality_run_r5")
    ap.add_argument("--out", default="QUALITY.md")
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    rows = load_log(os.path.join(args.run, "train_log.jsonl"))
    # the run may have been resumed with overlapping iteration ranges —
    # keep the LAST occurrence of each iteration (latest attempt wins)
    by_it = {}
    for r in rows:
        by_it[int(r.get("iter", -1))] = r
    rows = [by_it[k] for k in sorted(by_it)]
    mesh_rows = [r for r in rows if "mesh_psnr" in r]
    gs_rows = [r for r in rows if "mesh_psnr" not in r]

    test_txt = os.path.join(args.run, "test_results", "test_result.txt")
    eval_txt = os.path.join(args.run, "eval_results.txt")

    L = []
    L.append("# QUALITY — synthetic GT-mesh benchmark (r5)\n")
    L.append("Workload: `tools/run_quality.sh` — 40-frame 800×800 synthetic "
             "dynamic-mesh dataset with exact GT surfaces "
             "(`output/quality_ds`), recipe `configs/synthetic-quality-full"
             ".yaml` (grid 192, 12k iters, mesh phase from 5000, anchoring "
             "from 8000), single v5e chip through the axon tunnel.\n")
    if args.note:
        L.append(f"> {args.note}\n")

    # ---- training trajectory ----
    L.append("## Training trajectory (train_log.jsonl)\n")
    if rows:
        last = rows[-1]
        L.append(f"- reached iteration **{int(last['iter'])}**; final logged "
                 f"GS PSNR **{fmt(last.get('img_psnr'))} dB**"
                 + (f", mesh PSNR **{fmt(last.get('mesh_psnr'))} dB**"
                    if "mesh_psnr" in last else "") + "\n")
        if gs_rows:
            best_gs = max(r.get("img_psnr", 0) for r in gs_rows)
            L.append(f"- GS warm-up peak (pre-mesh): {fmt(best_gs)} dB\n")
        if mesh_rows:
            first_m = mesh_rows[0]
            best_m = max(r.get("mesh_psnr", 0) for r in mesh_rows)
            L.append(f"- mesh phase: {fmt(first_m.get('mesh_psnr'))} dB at "
                     f"iter {int(first_m['iter'])} -> peak {fmt(best_m)} dB; "
                     f"GS PSNR during mesh phase min "
                     f"{fmt(min(r.get('img_psnr', 99) for r in mesh_rows))} "
                     f"dB (the r4 failure mode was 41 -> 14)\n")
            thr = [r.get("density_thres", 0.0) for r in mesh_rows]
            L.append(f"- density_thres trajectory: {fmt(thr[0], 4)} -> "
                     f"{fmt(thr[-1], 4)} (min {fmt(min(thr), 4)}, max "
                     f"{fmt(max(thr), 4)})\n")
            ovf = [int(r.get("mesh_overflow", 0)) for r in mesh_rows]
            L.append(f"- mesh_overflow (geometry truncation): "
                     f"{'ZERO across the mesh phase' if max(ovf) == 0 else f'NONZERO (max {max(ovf)}) — capacities undersized'}\n")
            rovf = [int(r.get("raster_overflow", 0)) for r in mesh_rows]
            L.append(f"- raster tile-K overflow (depth-ordered occluded "
                     f"drops, DESIGN.md §5c): mean "
                     f"{sum(rovf)//max(len(rovf),1)}, max {max(rovf)}\n")
        an = [r for r in mesh_rows if any(k.startswith("anchor_")
                                          for k in r)]
        if an:
            a_last = an[-1]
            akeys = {k: a_last[k] for k in a_last if k.startswith("anchor_")}
            L.append(f"- anchoring ran {len(an)} logged times past iter "
                     f"8000; last stats: {akeys}\n")
        else:
            L.append("- anchoring: no anchor iterations logged "
                     "(run did not reach a healthy iter 8000+)\n")

        L.append("\n| iter | loss | GS PSNR | mesh PSNR | V | thr | it/s |\n")
        L.append("|---|---|---|---|---|---|---|\n")
        sel = [r for r in rows if int(r["iter"]) % 500 == 0]
        for r in sel:
            L.append(f"| {int(r['iter'])} | {fmt(r.get('loss'), 4)} | "
                     f"{fmt(r.get('img_psnr'))} | "
                     f"{fmt(r.get('mesh_psnr', float('nan')))} | "
                     f"{int(r.get('mesh_n_verts', 0))} | "
                     f"{fmt(r.get('density_thres', 0), 3)} | "
                     f"{fmt(r.get('iters_per_sec', 0))} |\n")
    else:
        L.append("MISSING: no train_log.jsonl rows\n")

    # ---- test-set metrics ----
    L.append("\n## Test-set metrics (run_testing ≙ reference train.py:559-760)\n")
    if os.path.exists(test_txt):
        L.append("```\n" + open(test_txt).read().strip() + "\n```\n")
    else:
        L.append("MISSING: test_results/test_result.txt — run_testing did "
                 "not complete\n")

    # ---- CD/EMD ----
    L.append("\n## Mesh evaluation: CD / EMD vs exact GT surfaces "
             "(≙ reference mesh_evaluation.py:98-178)\n")
    if os.path.exists(eval_txt):
        lines = open(eval_txt).read().strip().splitlines()
        tail = [l for l in lines if l.strip()][-6:]
        L.append("Last lines of eval_results.txt (per-frame means at the "
                 "end):\n```\n" + "\n".join(tail) + "\n```\n")
    else:
        L.append("MISSING: eval_results.txt — mesh_evaluation did not "
                 "complete\n")

    open(args.out, "w").write("".join(L))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
