"""Measure streaming-serving density: concurrent realtime streams/chip.

For each batch width S, times the steady-state window step of
  - StreamingEnhancer(num_streams=S)  (lockstep batch)
  - StreamBatcher(num_slots=S)        (serving engine, masked slots)
and reports the per-step latency, the realtime factor per stream, and
the sustainable concurrent realtime stream count
(S * chunk_seconds / step_seconds, requiring step_seconds <=
chunk_seconds for real-time operation).

    python tools/serving_bench.py --model <ckpt> [--json out.json]
        [--widths 1,4,8,16] [--chunk_seconds 0.5]

Runs on the real chip — check nothing else is using it first.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_fn(step_fn, warmup=3, iters=10):
    for _ in range(warmup):
        step_fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        step_fn()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="reports/trained_generator_r04_ema")
    ap.add_argument("--json", default=None)
    # width 1 is excluded by default: XLA constant-folds the chained
    # single-stream program (r4 measured 0.36 ms/tick — >10x the chip's
    # peak FLOP rate, physically impossible), so its device row is a
    # measurement artifact, not a capacity number (VERDICT r4 weak #5)
    ap.add_argument("--widths", default="4,8,16")
    ap.add_argument("--chunk_seconds", type=float, default=0.5)
    ap.add_argument("--left_context_s", type=float, default=1.0)
    ap.add_argument("--lookahead_s", type=float, default=0.25)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 window program (validated -0.001 PESQ "
                    "for inference)")
    ap.add_argument("--scan_iters", type=int, default=20,
                    help="chained window steps per device dispatch for "
                    "the compute-only timing (lower = faster compile)")
    args = ap.parse_args()

    import jax

    from cmgan_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(jax.config)
    import jax.numpy as jnp

    from cmgan_tpu.config import CMGANConfig
    from cmgan_tpu.streaming import StreamBatcher, StreamingEnhancer
    from tools.streaming_eval import load_generator_variables

    cfg = CMGANConfig()
    variables = load_generator_variables(args.model)
    dtype = jnp.bfloat16 if args.bf16 else None

    sr = 16_000
    chunk = int(args.chunk_seconds * sr)
    kw = dict(
        chunk=chunk,
        left_context=int(args.left_context_s * sr),
        lookahead=int(args.lookahead_s * sr),
    )
    chunk_s = chunk / sr
    rng = np.random.default_rng(0)
    widths = [int(w) for w in args.widths.split(",")]

    from cmgan_tpu.streaming import _window_fn

    rows = []
    for S in widths:
        block = (rng.standard_normal((S, chunk)) * 0.1).astype(np.float32)

        # device-compute-only: K chained window steps inside ONE
        # dispatch (lax.scan; each step's audio output feeds the next
        # step's analysis window, so nothing folds away), divided by K.
        # Per-call wall timing is useless on this rig — the remote
        # dispatch tunnel adds ~0.5-1 s of noise per call, two orders
        # above the actual compute; a server co-located with the chip
        # pays only the compute measured here.
        win_fn = _window_fn(cfg, dtype)
        window = kw["left_context"] + chunk + kw["lookahead"]
        K = args.scan_iters

        @jax.jit
        def chained(variables, w, c):
            def body(carry, _):
                return win_fn(variables, carry, c), None

            out, _ = jax.lax.scan(body, w, None, length=K)
            return out

        wdev = jnp.asarray(
            (rng.standard_normal((S, window)) * 0.1).astype(np.float32)
        )
        cdev = jnp.ones((S,), jnp.float32)
        chained(variables, wdev, cdev).block_until_ready()
        t_dev = bench_fn(
            lambda: chained(variables, wdev, cdev).block_until_ready(),
            warmup=1, iters=3,
        ) / K

        enh = StreamingEnhancer(
            cfg, variables, num_streams=S, dtype=dtype, **kw
        )
        enh.push(block)  # fill pipeline/compile
        t_lockstep = bench_fn(lambda: enh.push(block))

        b = StreamBatcher(cfg, variables, num_slots=S, dtype=dtype, **kw)
        slots = [b.open() for _ in range(S)]
        blocks = {s: block[i] for i, s in enumerate(slots)}
        b.step(blocks)
        t_batcher = bench_fn(lambda: b.step(blocks))

        row = {
            "streams": S,
            "device_step_ms": round(t_dev * 1e3, 2),
            "device_rt_streams": round(S * chunk_s / t_dev, 1),
            "lockstep_step_ms": round(t_lockstep * 1e3, 2),
            "batcher_step_ms": round(t_batcher * 1e3, 2),
            "lockstep_rt_streams": round(S * chunk_s / t_lockstep, 1),
            "batcher_rt_streams": round(S * chunk_s / t_batcher, 1),
            "realtime_ok": bool(t_dev <= chunk_s),
        }
        rows.append(row)
        print(row, flush=True)

    out = {
        "model": args.model,
        "chunk_seconds": chunk_s,
        "dtype": "bf16" if args.bf16 else "fp32",
        "excluded": "streams=1 chained row (XLA constant-folds the "
                    "single-stream chain; its r4 0.36 ms/tick implied "
                    ">10x peak FLOPs — artifact, not capacity)",
        "rows": rows,
    }
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
