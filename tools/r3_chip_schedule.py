"""Round-3 chip schedule: label-mode A/B, then the long quality run.

Runs sequentially on the single TPU chip (ONE process at a time):

  1. Wait for any current chip job (pid file) to exit.
  2. Label-schedule A/B (VERDICT round-2 item 4): from one common
     checkpoint, 1000 steps per mode (host / host_async / device) on
     the diversified round-3 corpus, held-out eval before/after.
  3. Pick the winner: the fastest mode whose final held-out PESQ is
     within `tol` of the best mode's (speed order device > host_async >
     host); otherwise the best-PESQ mode.
  4. Long run: resume the winner's rolling-best checkpoint and train
     until `--until` (HH:MM local), eval every 2 epochs.

    python tools/r3_chip_schedule.py --resume /tmp/qrun_r3_tl/ckpt_best \
        --corpus /tmp/corpus_r3 --until 20:30
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODES = ("host", "host_async", "device")
SPEED_ORDER = {"device": 0, "host_async": 1, "host": 2}  # fastest first


def wait_for_pid(pid_path: str):
    if not os.path.exists(pid_path):
        return
    pid = int(open(pid_path).read().strip())
    while os.path.exists(f"/proc/{pid}"):
        print(f"waiting for chip job pid={pid} ...", flush=True)
        time.sleep(60)


def run_quality(out: str, extra: list[str], log: str):
    cmd = [sys.executable, os.path.join(REPO, "tools", "quality_run.py"),
           "--out", out] + extra
    print("RUN:", " ".join(cmd), flush=True)
    with open(log, "w") as fh:
        proc = subprocess.run(cmd, stdout=fh, stderr=subprocess.STDOUT,
                              cwd=REPO)
    if proc.returncode != 0:
        print(f"FAILED rc={proc.returncode}: see {log}", flush=True)
    return proc.returncode


def final_pesq(out: str) -> float:
    path = os.path.join(out, "eval.jsonl")
    rows = [json.loads(ln) for ln in open(path) if ln.strip()]
    return max(r["agg"]["enh"]["pesq"] for r in rows if r["tag"] != "init")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resume", required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--until", default="20:30",
                    help="HH:MM local wall-clock deadline for the long run")
    ap.add_argument("--ab_steps", type=int, default=1000)
    ap.add_argument("--tol", type=float, default=0.03)
    ap.add_argument("--wait_pid_file", default="/tmp/qrun.pid")
    ap.add_argument("--skip_ab", action="store_true")
    args = ap.parse_args()

    wait_for_pid(args.wait_pid_file)

    common = ["--data_from", args.corpus, "--time_loss_domain", "normalized",
              "--batch", "8", "--remat", "--decay_epochs", "174"]

    results = {}
    if not args.skip_ab:
        for mode in MODES:
            out = f"/tmp/qrun_r3_lab_{mode}"
            rc = run_quality(
                out,
                common + ["--resume", args.resume,
                          "--pesq_label_mode", mode,
                          "--max_new_steps", str(args.ab_steps),
                          "--minutes", "75",
                          "--eval_every_epochs", "1000"],
                f"/tmp/qrun_r3_lab_{mode}.log",
            )
            if rc == 0:
                results[mode] = final_pesq(out)
            print(f"A/B {mode}: PESQ {results.get(mode)}", flush=True)
        with open("/tmp/r3_label_ab.json", "w") as fh:
            json.dump(results, fh)

    if results:
        best = max(results.values())
        ok = [m for m, p in results.items() if p >= best - args.tol]
        winner = sorted(ok, key=lambda m: SPEED_ORDER[m])[0]
        resume = f"/tmp/qrun_r3_lab_{winner}/ckpt_best"
        if not os.path.isdir(resume):
            resume = args.resume
    else:
        winner, resume = "host", args.resume
    print(f"label A/B results={results} -> winner={winner}", flush=True)

    # --- long-form 48 kHz TRAIN smoke (BASELINE config 5): flash
    # attention in train mode makes long windows fit one chip; try the
    # 12 s x 2 configuration, fall back to 8 s x 1 on OOM.
    for secs, batch in ((12, 2), (8, 1)):
        cmd = [sys.executable,
               os.path.join(REPO, "tools", "longform_train_smoke.py"),
               "--seconds", str(secs), "--batch", str(batch),
               "--json", "/tmp/longform_smoke.json"]
        print("RUN:", " ".join(cmd), flush=True)
        with open("/tmp/longform_smoke.log", "a") as fh:
            rc = subprocess.run(cmd, stdout=fh, stderr=subprocess.STDOUT,
                                cwd=REPO, timeout=3600).returncode
        print(f"long-form smoke {secs}s x{batch}: rc={rc}", flush=True)
        if rc == 0:
            break

    now = dt.datetime.now()
    hh, mm = map(int, args.until.split(":"))
    deadline = now.replace(hour=hh, minute=mm, second=0)
    if deadline < now:
        deadline += dt.timedelta(days=1)
    minutes = max((deadline - now).total_seconds() / 60.0, 10.0)
    print(f"long run: {minutes:.0f} minutes, mode={winner}", flush=True)

    run_quality(
        "/tmp/qrun_r3_main",
        common + ["--resume", resume,
                  "--pesq_label_mode", winner,
                  "--minutes", f"{minutes:.0f}",
                  "--eval_every_epochs", "2"],
        "/tmp/qrun_r3_main.log",
    )
    print("schedule complete", flush=True)


if __name__ == "__main__":
    main()
