"""Measure streaming-vs-offline quality on a trained checkpoint.

Round-2 verdict item 5: streaming.py claimed "1-2 s context recovers
offline quality to within a few hundredths PESQ" with no measurement.
This tool produces the table: held-out tracks enhanced offline
(Enhancer) and through StreamingEnhancer at several
(left_context, lookahead) settings, scored with the calibrated PESQ +
STOI + segSNR.

Runs on CPU (forces jax_platforms=cpu) so it can execute while the
chip trains.

    python tools/streaming_eval.py --model <ckpt> --eval_dir <dir> \
        [--json out.json]

--model accepts either an inference-variables checkpoint
(e.g. reports/trained_generator_r02) or a full TrainState directory
(e.g. a quality run's ckpt_best) — detected by tree keys.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOLDOUT = ["p232_005.wav", "p232_021.wav", "p257_008.wav", "p257_015.wav",
           "p257_023.wav"]

# (left_context, lookahead) in seconds — the verdict's requested grid
CONFIGS = [(1.0, 0.25), (1.5, 0.25), (2.0, 0.5)]


def load_generator_variables(path: str):
    from cmgan_tpu.checkpoint import restore_variables

    tree = restore_variables(os.path.abspath(path))
    if "gen_params" in tree:  # full TrainState layout
        return {"params": tree["gen_params"], "batch_stats": tree["gen_stats"]}
    return tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="reports/trained_generator_r04_ema",
                    help="checkpoint path, or a comma-separated list — "
                    "models share the jitted window/offline programs "
                    "(variables are jit ARGUMENTS), so evaluating N "
                    "checkpoints costs one compile")
    ap.add_argument("--eval_dir", default="/tmp/corpus_r3/eval")
    ap.add_argument("--json", default=None)
    ap.add_argument("--chunk_seconds", type=float, default=0.5)
    ap.add_argument("--emit", default="wola", choices=["wola", "crossfade"])
    ap.add_argument(
        "--platform", default="cpu", choices=["cpu", "tpu"],
        help="cpu (default) runs beside a busy chip; tpu uses the real "
        "chip (ONE process may own it) — per-window dispatches ride the "
        "tunnel but the model forward is ~100x faster than this host",
    )
    ap.add_argument(
        "--offline_from", default=None,
        help="prior results JSON whose 'offline' aggregate is reused "
        "(skips re-enhancing/scoring the offline baseline; only valid "
        "for the same --model and --eval_dir)",
    )
    ap.add_argument(
        "--configs", default=None,
        help="override the (left_context_s, lookahead_s) grid, e.g. "
        "'1.0:0.25,1.5:0.5'",
    )
    args = ap.parse_args()
    configs = CONFIGS
    if args.configs:
        configs = [tuple(map(float, kv.split(":")))
                   for kv in args.configs.split(",")]

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from cmgan_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(jax.config)

    from cmgan_tpu.config import CMGANConfig
    from cmgan_tpu.data import read_wav
    from cmgan_tpu.inference import Enhancer
    from cmgan_tpu.metrics import compute_metrics
    from cmgan_tpu.streaming import StreamingEnhancer

    cfg = CMGANConfig()
    sr = cfg.dsp.sample_rate
    model_paths = args.model.split(",")

    tracks = []
    for name in HOLDOUT:
        clean, _ = read_wav(os.path.join(args.eval_dir, "clean", name))
        noisy, _ = read_wav(os.path.join(args.eval_dir, "noisy", name))
        tracks.append((name, clean[0].astype(np.float64),
                       noisy[0].astype(np.float32)))

    def score(clean, est):
        m = min(clean.size, est.size)
        pesq, _, _, _, ssnr, stoi = compute_metrics(
            clean[:m], est[:m].astype(np.float64), sr
        )
        return {"pesq": pesq, "ssnr": ssnr, "stoi": stoi}

    agg = lambda d: {k: float(np.mean([v[k] for v in d.values()]))
                     for k in ("pesq", "ssnr", "stoi")}
    chunk = int(args.chunk_seconds * sr)
    all_results = []
    for model_path in model_paths:
        variables = load_generator_variables(model_path)
        results = {"model": model_path, "emit": args.emit, "rows": []}

        if args.offline_from:
            with open(args.offline_from) as fh:
                results["offline"] = json.load(fh)["offline"]
            print(f"offline (reused): {results['offline']}", flush=True)
        else:
            enh = Enhancer(cfg, variables)
            offline = {}
            for name, clean, noisy in tracks:
                offline[name] = score(clean, enh.enhance(noisy))
                print(f"[{model_path}] offline {name}: {offline[name]}",
                      flush=True)
            results["offline"] = agg(offline)

        for left_s, look_s in configs:
            per = {}
            for name, clean, noisy in tracks:
                s = StreamingEnhancer(
                    cfg, variables,
                    chunk=chunk,
                    left_context=int(left_s * sr),
                    lookahead=int(look_s * sr),
                    emit=args.emit,
                )
                outs = [s.push(noisy)]
                outs.append(s.flush())
                est = np.concatenate([o for o in outs if o.size])[: noisy.size]
                per[name] = score(clean, est)
            row = {
                "left_context_s": left_s,
                "lookahead_s": look_s,
                "latency_ms": 1000.0 * (chunk / sr + look_s),
                "agg": agg(per),
                "delta_pesq_vs_offline": agg(per)["pesq"] - results["offline"]["pesq"],
                "per_track": per,
            }
            results["rows"].append(row)
            print(f"[{model_path}] streaming left={left_s}s look={look_s}s: "
                  f"{row['agg']} "
                  f"(dPESQ {row['delta_pesq_vs_offline']:+.3f})", flush=True)

        print(f"\nmodel: {model_path}")
        print("| config | latency | PESQ | dPESQ | SSNR | STOI |")
        print("|---|---|---|---|---|---|")
        o = results["offline"]
        print(f"| offline | — | {o['pesq']:.3f} | — | {o['ssnr']:.2f} | {o['stoi']:.3f} |")
        for r in results["rows"]:
            a = r["agg"]
            print(f"| {r['left_context_s']} s ctx, {r['lookahead_s']} s look "
                  f"| {r['latency_ms']:.0f} ms | {a['pesq']:.3f} "
                  f"| {r['delta_pesq_vs_offline']:+.3f} | {a['ssnr']:.2f} "
                  f"| {a['stoi']:.3f} |")
        all_results.append(results)

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(all_results[0] if len(all_results) == 1
                      else {"models": all_results}, fh, indent=2)


if __name__ == "__main__":
    main()
