"""Stall watchdog for chip training runs behind the remote-dispatch tunnel.

The axon tunnel occasionally drops an in-flight RPC without an error;
the client then waits forever (observed twice in round 5: a
`quality_run.py` process going idle — 0% CPU, futex wait — minutes
after a successful eval, with the chip healthy). `quality_run.py`
checkpoints `ckpt_best` at every improving eval and supports
`--resume`, so the recovery is mechanical: kill the wedged process and
relaunch from the latest checkpoint. This wrapper automates that.

    python tools/run_watchdog.py --out /tmp/qrun_x --log /tmp/qrun_x.log \
        [--stall_secs 480] [--max_relaunches 3] -- <quality_run args...>

Freshness is the newest mtime of the run's metrics.jsonl / eval.jsonl /
log file; a run is declared stalled when none of them moved for
--stall_secs (default 480 s — the longest healthy silent window is an
eval + checkpoint save, ~3-4 min; process start gets a 900 s grace for
corpus build + compile). On relaunch, `--init_gen` is dropped (the
restored full TrainState supersedes it) and `--resume <out>/ckpt_best`
is appended when that checkpoint exists.

Exit code: the wrapped run's rc once it exits by itself (0 on normal
completion), 1 when the relaunch budget is exhausted.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_mtime(paths: list[str]) -> float:
    ts = [0.0]
    for p in paths:
        try:
            ts.append(os.path.getmtime(p))
        except OSError:
            pass
    return max(ts)


def strip_flag_with_value(argv: list[str], flag: str) -> list[str]:
    out, skip = [], False
    for a in argv:
        if skip:
            skip = False
            continue
        if a == flag:
            skip = True
            continue
        if a.startswith(flag + "="):
            continue
        out.append(a)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="quality_run --out dir")
    ap.add_argument("--log", required=True, help="combined stdout/stderr log")
    ap.add_argument("--stall_secs", type=float, default=480.0)
    ap.add_argument("--startup_grace_secs", type=float, default=900.0)
    ap.add_argument("--max_relaunches", type=int, default=3)
    ap.add_argument("run_args", nargs=argparse.REMAINDER,
                    help="-- then quality_run.py args (no --out/--resume)")
    args = ap.parse_args()
    run_args = [a for a in args.run_args if a != "--"]

    watched = [os.path.join(args.out, "metrics.jsonl"),
               os.path.join(args.out, "eval.jsonl"), args.log]
    relaunches = 0
    resume: str | None = None
    while True:
        argv = [sys.executable, os.path.join(REPO, "tools", "quality_run.py"),
                "--out", args.out] + run_args
        if resume:
            argv = strip_flag_with_value(argv, "--init_gen")
            argv += ["--resume", resume]
        with open(args.log, "a") as logf:
            logf.write(f"[watchdog] launching (attempt {relaunches + 1}): "
                       f"{' '.join(argv)}\n")
            logf.flush()
            proc = subprocess.Popen(argv, stdout=logf,
                                    stderr=subprocess.STDOUT, cwd=REPO)
        start = time.time()
        rc: int | None = None
        stalled = False
        data_files = watched[:2]  # metrics.jsonl / eval.jsonl only
        while rc is None:
            time.sleep(30)
            rc = proc.poll()
            if rc is not None:
                break
            last = max(newest_mtime(watched), start)
            # the startup grace must key on the run's DATA files, not
            # the log: import-time stderr (AOT loader warnings) touches
            # the log within seconds of launch, which would otherwise
            # collapse the grace to stall_secs while the first compile
            # is still in flight
            grace = (args.startup_grace_secs
                     if newest_mtime(data_files) < start else args.stall_secs)
            if time.time() - last > grace:
                stalled = True
                print(f"[watchdog] stall >{grace:.0f}s at "
                      f"{time.strftime('%H:%M:%S')}; killing pid {proc.pid}",
                      flush=True)
                proc.terminate()
                try:
                    proc.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    proc.wait()
                rc = None
                break
        if rc == 0:
            return 0
        if rc is not None and not stalled:
            print(f"[watchdog] run exited rc={rc}", flush=True)
        relaunches += 1
        if relaunches > args.max_relaunches:
            print("[watchdog] relaunch budget exhausted", flush=True)
            return 1
        ckpt = os.path.join(args.out, "ckpt_best")
        if os.path.isdir(ckpt):
            resume = ckpt
        time.sleep(15)  # let the tunnel/device settle before relaunching


if __name__ == "__main__":
    sys.exit(main())
