"""Evaluation CLI — the analog of reference src/evaluation.py:103-117.

    python -m cmgan_tpu.cli.evaluate --test_dir <dir with noisy/ clean/> \
        --model_path <checkpoint> [--save_tracks --save_dir out/] [--exact]

Enhances every (natsorted) noisy track, scores the 6-metric suite
against clean, prints the aggregate line. --exact uses the reference's
bit-faithful chunk shapes (one compile per distinct length — CPU
friendly); the default bucketed mode caps compile count for TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate CMGAN-TPU on a test set")
    p.add_argument("--model_path", type=str, default=None,
                   help="orbax variables checkpoint (params+batch_stats); "
                   "random init if omitted")
    p.add_argument("--torch_ckpt", type=str, default=None,
                   help="import a reference PyTorch state_dict instead")
    p.add_argument("--test_dir", type=str, required=True)
    p.add_argument("--save_tracks", action="store_true")
    p.add_argument("--save_dir", type=str, default="./saved_tracks")
    p.add_argument("--exact", action="store_true",
                   help="reference-exact chunk shapes (recompiles per length)")
    p.add_argument("--batch", type=int, default=8,
                   help="tracks per device batch (bucketed mode only)")
    p.add_argument("--chunk_seconds", type=int, default=16,
                   help="max segment length; 16 matches the reference, "
                   "2 matches the training context (equal quality, faster)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (quality-neutral: -0.001 PESQ)")
    p.add_argument("--limit", type=int, default=0, help="evaluate first N tracks only")
    p.add_argument("--json", action="store_true", help="emit one JSON line")
    return p.parse_args(argv)


def load_variables(cfg, args):
    import jax
    import jax.numpy as jnp

    from cmgan_tpu.models import TSCNet

    model = TSCNet(cfg.model)
    frames = cfg.dsp.num_frames(cfg.train.cut_len)
    spec = jnp.zeros((1, frames, cfg.dsp.num_freqs, 2))
    variables = model.init({"params": jax.random.key(0)}, spec)
    if args.torch_ckpt:
        from cmgan_tpu.checkpoint.torch_import import load_torch_generator

        return load_torch_generator(args.torch_ckpt, variables)
    if args.model_path:
        from cmgan_tpu.checkpoint import restore_variables

        raw = restore_variables(args.model_path)  # ONE read for either kind
        if isinstance(raw, dict) and "gen_params" in raw:
            # full TrainState checkpoint (Trainer.save_checkpoint):
            # evaluate its generator half directly
            return {"params": raw["gen_params"], "batch_stats": raw["gen_stats"]}
        return raw
    return variables


def main(argv=None):
    import numpy as np

    from cmgan_tpu.config import CMGANConfig
    from cmgan_tpu.data import natsorted, read_wav, write_wav
    from cmgan_tpu.inference import Enhancer
    from cmgan_tpu.metrics import compute_metrics

    import dataclasses

    import jax.numpy as jnp

    from cmgan_tpu.config import EvalConfig

    args = parse_args(argv)
    cfg = CMGANConfig()
    cfg = dataclasses.replace(
        cfg,
        eval=EvalConfig(
            cut_len=cfg.dsp.sample_rate * args.chunk_seconds,
            save_tracks=args.save_tracks,
            save_dir=args.save_dir,
        ),
    )

    variables = load_variables(cfg, args)
    enhancer = Enhancer(cfg, variables, dtype=jnp.bfloat16 if args.bf16 else None)

    noisy_dir = os.path.join(args.test_dir, "noisy")
    clean_dir = os.path.join(args.test_dir, "clean")
    names = natsorted(os.listdir(noisy_dir))
    if args.limit:
        names = names[: args.limit]
    if args.save_tracks:
        os.makedirs(args.save_dir, exist_ok=True)

    sr = cfg.dsp.sample_rate
    totals = np.zeros(6)
    audio_seconds = 0.0
    t0 = time.time()
    if args.exact or args.batch <= 1:
        ests = []
        for name in names:
            noisy, r = read_wav(os.path.join(noisy_dir, name))
            assert r == sr, name
            ests.append(
                enhancer.enhance(noisy[0], mode="exact" if args.exact else "bucket")
            )
    else:
        tracks = []
        for name in names:
            noisy, r = read_wav(os.path.join(noisy_dir, name))
            assert r == sr, name
            tracks.append(noisy[0])
        ests = enhancer.enhance_batch(tracks, batch_cap=args.batch)
    enhance_wall = time.time() - t0

    for name, est in zip(names, ests):
        audio_seconds += est.size / sr
        if args.save_tracks:
            write_wav(os.path.join(args.save_dir, name), est, sr)
        clean, r = read_wav(os.path.join(clean_dir, name))
        assert r == sr, name
        totals += np.array(compute_metrics(clean[0].astype(np.float64), est, sr, 0))
    wall = time.time() - t0

    avg = totals / max(len(names), 1)
    result = {
        "tracks": len(names),
        "pesq": round(avg[0], 6),
        "csig": round(avg[1], 6),
        "cbak": round(avg[2], 6),
        "covl": round(avg[3], 6),
        "ssnr": round(avg[4], 6),
        "stoi": round(avg[5], 6),
        "realtime_factor": round(audio_seconds / wall, 2),
        "enhance_realtime_factor": round(audio_seconds / max(enhance_wall, 1e-9), 2),
    }
    if args.json:
        print(json.dumps(result))
    else:
        print(
            "pesq: ", avg[0], "csig: ", avg[1], "cbak: ", avg[2],
            "covl: ", avg[3], "ssnr: ", avg[4], "stoi: ", avg[5],
        )
        print(f"[{len(names)} tracks, {result['realtime_factor']}x realtime]")
    return result


if __name__ == "__main__":
    main()
