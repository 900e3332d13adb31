"""Summarize quality_run.py outputs into markdown tables.

Reads <run_dir>/eval.jsonl and <run_dir>/metrics.jsonl and prints:
  - the held-out-eval trajectory (PESQ/composites vs the noisy floor),
  - loss-curve summary (windowed G/D means),
  - discriminator-vs-PESQ correlation trajectory.

Usage:
  python tools/quality_report.py /tmp/qrun_fp32 [/tmp/qrun_bf16 ...]

With two or more run dirs, also prints a step-matched A/B table of
enhanced PESQ (rows = eval steps present in all runs) — used for the
fp32 vs bf16 training-numerics comparison in QUALITY_r02.md.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def load_jsonl(path):
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def eval_table(run_dir):
    evals = load_jsonl(os.path.join(run_dir, "eval.jsonl"))
    lines = [
        "| step | enh PESQ | enh CSIG | enh CBAK | enh COVL | enh SSNR | enh STOI | D-PESQ r |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for rec in evals:
        e = rec["agg"]["enh"]
        lines.append(
            "| %d | %.3f | %.3f | %.3f | %.3f | %.2f | %.3f | %.3f |"
            % (
                rec["step"], e["pesq"], e["csig"], e["cbak"], e["covl"],
                e["ssnr"], e["stoi"], rec["disc_corr"]["pearson_r"],
            )
        )
    if evals:
        n = evals[0]["agg"]["noisy"]
        lines.append(
            "| noisy floor | %.3f | %.3f | %.3f | %.3f | %.2f | %.3f | — |"
            % (n["pesq"], n["csig"], n["cbak"], n["covl"], n["ssnr"], n["stoi"])
        )
    return "\n".join(lines)


def loss_summary(run_dir, window=250):
    steps = load_jsonl(os.path.join(run_dir, "metrics.jsonl"))
    if not steps:
        return "(no metrics.jsonl)"
    lines = ["| steps | mean G loss | mean D loss |", "|---|---|---|"]
    for lo in range(0, len(steps), window):
        chunk = steps[lo : lo + window]
        g = np.mean([s["gen_loss"] for s in chunk])
        d = np.mean([s["disc_loss"] for s in chunk])
        lines.append(
            "| %d–%d | %.4f | %.4f |"
            % (chunk[0]["step"], chunk[-1]["step"], g, d)
        )
    return "\n".join(lines)


def ab_table(run_dirs):
    all_evals = {d: load_jsonl(os.path.join(d, "eval.jsonl")) for d in run_dirs}
    common = None
    for evals in all_evals.values():
        steps = {r["step"] for r in evals}
        common = steps if common is None else common & steps
    if not common:
        return "(no common eval steps)"
    names = [os.path.basename(d.rstrip("/")) for d in run_dirs]
    lines = [
        "| step | " + " | ".join(f"{n} PESQ" for n in names) + " |",
        "|---" * (1 + len(names)) + "|",
    ]
    for step in sorted(common):
        row = [str(step)]
        for d in run_dirs:
            rec = next(r for r in all_evals[d] if r["step"] == step)
            row.append("%.3f" % rec["agg"]["enh"]["pesq"])
        lines.append("| " + " | ".join(row) + " |")
    return "\n".join(lines)


def main():
    run_dirs = sys.argv[1:]
    if not run_dirs:
        sys.exit("usage: quality_report.py <run_dir> [<run_dir> ...]")
    for d in run_dirs:
        print(f"### {d}\n")
        print(eval_table(d))
        print()
        print(loss_summary(d))
        print()
    if len(run_dirs) > 1:
        print("### Step-matched A/B (enhanced PESQ)\n")
        print(ab_table(run_dirs))


if __name__ == "__main__":
    main()
