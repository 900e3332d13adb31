"""Long-form quality sanity check (VERDICT r4 item 7 / weak #6).

The long-form path had perf rows ("trains at 2.47x realtime", "~5x
realtime 30 s windows") but zero quality evidence. No 48 kHz corpus
exists here and the 48 kHz preset's weights are untrained, so a 48 kHz
PESQ number would be meaningless; what IS measurable with the trained
16 kHz checkpoint is whether the long-form inference *mechanism* — one
long flash-attention window over the whole track instead of the
reference-parity 16 s chunking — produces equivalent output on the
same audio, scored by the full metric suite.

Protocol: concatenate the 5 held-out pairs into one continuous long
track (~28 s — 2801 frames, 5.5x the 512-frame flash threshold and
14x the 2 s training crop), then enhance it two ways with identical
weights:
  A. chunked: the production default (EvalConfig.cut_len=16 s fold,
     reference src/evaluation.py:25-34 behavior),
  B. long-form: ONE window spanning the entire track (cut_len raised
     above track length; attention_impl='auto' routes >=512 frames
     through the O(T)-memory flash kernel — the same code path the
     48 kHz preset uses at 30 s windows).
Both are scored vs the concatenated clean with the 6-metric suite.
Equivalent-or-better B closes "runs" -> "works" for the long-form path.

    python tools/longform_quality_check.py --model reports/trained_generator_r04_ema \
        --json reports/longform_quality_r5.json

Runs on the chip (two full-model compiles; CPU works with --platform cpu).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.quality_run import HOLDOUT, REF  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="reports/trained_generator_r04_ema")
    ap.add_argument("--json", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from cmgan_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(jax.config)

    from cmgan_tpu.config import CMGANConfig
    from cmgan_tpu.data import read_wav
    from cmgan_tpu.inference import Enhancer
    from cmgan_tpu.metrics import compute_metrics
    from tools.streaming_eval import load_generator_variables

    cleans, noisys = [], []
    for n in HOLDOUT:
        c, sr = read_wav(os.path.join(REF, "clean", n))
        x, _ = read_wav(os.path.join(REF, "noisy", n))
        cleans.append(c[0].astype(np.float64))
        noisys.append(x[0].astype(np.float64))
    clean = np.concatenate(cleans)
    noisy = np.concatenate(noisys)
    seconds = clean.size / sr
    print(f"long track: {seconds:.1f} s ({clean.size} samples)", flush=True)

    cfg = CMGANConfig()
    variables = load_generator_variables(args.model)

    results = {"track_seconds": round(seconds, 1), "model": args.model,
               "holdout": HOLDOUT}
    rows = (
        ("chunked_16s", cfg.eval.cut_len),           # production default
        ("longform_single_window", clean.size + cfg.dsp.hop),
    )
    keys = ("pesq", "csig", "cbak", "covl", "ssnr", "stoi")

    for name, ev_cut in rows:
        c = dataclasses.replace(
            cfg, eval=dataclasses.replace(cfg.eval, cut_len=ev_cut)
        )
        enh = Enhancer(c, variables)
        est = enh.enhance(noisy.astype(np.float32)).astype(np.float64)
        assert est.size == clean.size, (est.size, clean.size)
        m = compute_metrics(clean, est, sr)
        results[name] = dict(zip(keys, (round(float(v), 4) for v in m)))
        print(name, results[name], flush=True)

    m_noisy = compute_metrics(clean, noisy, sr)
    results["noisy_floor"] = dict(
        zip(keys, (round(float(v), 4) for v in m_noisy))
    )
    print("noisy_floor", results["noisy_floor"], flush=True)
    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
