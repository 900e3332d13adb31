"""Long-form 48 kHz TRAINING smoke (BASELINE config 5, single chip).

Round 2 could only demonstrate long-form *inference*: the fused
attention kernels were (wrongly) gated out of train mode, and dense
attention at long-form training shapes needs ~74 GB of logits
(ROADMAP). With the round-3 gate removal the flash kernel's O(T)
memory applies to training too. This smoke demonstrates, on one real
chip, the full long-form GAN train step — G forward/backward (flash
attention over thousands of time frames) + D update — fitting in HBM,
and measures sec/step.

It is a MEMORY/THROUGHPUT demonstration on synthetic audio, not a
quality run (no 48 kHz corpus exists in this environment; PESQ labels
are synthetic constants, which exercises the same D-step compute).

    python tools/longform_train_smoke.py --seconds 12 --batch 2
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=12.0,
                    help="training window length (48 kHz)")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    from cmgan_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(jax.config)

    from cmgan_tpu.config import long_form_48k
    from cmgan_tpu.train import init_train_state, make_train_steps

    cfg = long_form_48k(num_tscb_blocks=args.blocks)
    cut = int(args.seconds * cfg.dsp.sample_rate)
    cut -= cut % cfg.dsp.hop
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            attention_impl="flash",  # force the O(T) kernel in train mode
            remat=True,
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=args.batch, cut_len=cut
        ),
    )
    frames = cfg.dsp.num_frames(cut)
    print(f"long-form train smoke: {args.seconds}s @48kHz = {frames} time "
          f"frames, {cfg.dsp.num_freqs} freqs, batch {args.batch}, "
          f"{args.blocks} TSCB blocks (attn_dropout "
          f"{cfg.model.attn_dropout})", flush=True)

    g_step, d_step, *_ = make_train_steps(cfg, steps_per_epoch=100)
    state = init_train_state(cfg, seed=0, steps_per_epoch=100)

    rng = np.random.default_rng(0)
    clean = rng.standard_normal((args.batch, cut)).astype(np.float32) * 0.1
    noisy = clean + rng.standard_normal((args.batch, cut)).astype(np.float32) * 0.03
    # synthetic labels: same D compute as real ones (this is a smoke)
    scores = np.full((args.batch,), 2.5, np.float32)

    t0 = time.perf_counter()
    state, metrics, handoff = g_step(state, clean, noisy)
    state, dloss = d_step(
        state, handoff["clean_mag"], handoff["est_mag"], scores
    )
    gl = float(metrics["gen_loss"])
    compile_s = time.perf_counter() - t0
    assert np.isfinite(gl) and np.isfinite(float(dloss))
    print(f"first step (incl. compile): {compile_s:.1f}s "
          f"gen_loss={gl:.4f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics, handoff = g_step(state, clean, noisy)
        state, dloss = d_step(
            state, handoff["clean_mag"], handoff["est_mag"], scores
        )
    gl = float(metrics["gen_loss"])  # sync
    dt = (time.perf_counter() - t0) / args.steps
    audio_per_step = args.batch * args.seconds
    rec = {
        "config": "long_form_48k train smoke",
        "seconds_per_window": args.seconds,
        "time_frames": frames,
        "batch": args.batch,
        "tscb_blocks": args.blocks,
        "sec_per_step": round(dt, 3),
        "train_realtime_factor": round(audio_per_step / dt, 2),
        "gen_loss_finite": bool(np.isfinite(gl)),
    }
    print(json.dumps(rec), flush=True)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(rec, fh, indent=2)


if __name__ == "__main__":
    main()
