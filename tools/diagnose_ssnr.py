"""Diagnose the enhanced-SSNR deficit (round-3 VERDICT item 1).

Round-2 evidence: held-out enhanced segSNR sat at 3.2-3.7 dB -- BELOW
the 6.13 dB noisy floor -- while PESQ improved to 2.77. PESQ performs
level alignment; segSNR does not. This script decomposes the per-track
segSNR of the trained generator's output into candidate causes:

  gain      -- segSNR after the optimal scalar rescale
               alpha* = <clean, est> / <est, est>  (closed form).
               A big jump here means the model outputs systematically
               attenuated/amplified audio: consistent with the
               reference's time-loss quirk (src/train.py:140-141 pairs
               normalized-domain est_audio with the UNnormalized batch
               clean; c = sqrt(L/sum(noisy^2)) >> 1 for typical wav
               levels, so the L1 term drags the output gain down).
  shift     -- segSNR after the best integer alignment in +-40 samples
               (cross-correlation peak). A jump here means an iSTFT /
               framing misalignment.
  gain+shift -- both corrections.
  band      -- error energy split at 2 kHz (broadband vs HF hiss).
  activity  -- per-frame segSNR split by clean-frame energy (speech vs
               silence frames): residual noise lives in silence,
               distortion lives in speech.

Usage:
  python tools/diagnose_ssnr.py --model reports/trained_generator_r02 \
      --eval_dir /tmp/qrun_fp32c/eval [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cmgan_tpu.data import read_wav  # noqa: E402

HOLDOUT = ["p232_005.wav", "p232_021.wav", "p257_008.wav", "p257_015.wav",
           "p257_023.wav"]

SR = 16000


def seg_snr(clean: np.ndarray, est: np.ndarray, frame: int = 480,
            skip: int = 120, lo: float = -10.0, hi: float = 35.0):
    """Segmental SNR matching metrics/composite.py semantics (30 ms
    window, 1/4 skip, clamped [-10, 35] dB). Returns (mean, per-frame
    array, per-frame clean energy)."""
    n = min(clean.size, est.size)
    clean, est = clean[:n], est[:n]
    num_frames = (n - frame) // skip + 1
    snrs = np.empty(num_frames)
    energies = np.empty(num_frames)
    w = 0.5 * (1 - np.cos(2 * np.pi * np.arange(1, frame + 1) / (frame + 1)))
    for i in range(num_frames):
        s = clean[i * skip: i * skip + frame] * w
        e = (clean[i * skip: i * skip + frame] - est[i * skip: i * skip + frame]) * w
        sig = np.sum(s * s)
        err = np.sum(e * e)
        snrs[i] = 10 * np.log10(sig / (err + 1e-20) + 1e-20)
        energies[i] = sig
    return float(np.mean(np.clip(snrs, lo, hi))), np.clip(snrs, lo, hi), energies


def best_shift(clean: np.ndarray, est: np.ndarray, max_lag: int = 40) -> int:
    n = min(clean.size, est.size)
    c, e = clean[:n], est[:n]
    best, arg = -np.inf, 0
    for lag in range(-max_lag, max_lag + 1):
        if lag >= 0:
            v = float(np.dot(c[lag:], e[: n - lag]))
        else:
            v = float(np.dot(c[:n + lag], e[-lag:]))
        if v > best:
            best, arg = v, lag
    return arg


def apply_shift(est: np.ndarray, lag: int) -> np.ndarray:
    if lag > 0:
        return np.concatenate([est[lag:], np.zeros(lag)])
    if lag < 0:
        return np.concatenate([np.zeros(-lag), est[:lag]])
    return est


def band_split_energy(err: np.ndarray, sr: int = SR, cut_hz: float = 2000.0):
    spec = np.fft.rfft(err)
    freqs = np.fft.rfftfreq(err.size, 1.0 / sr)
    p = np.abs(spec) ** 2
    lo = float(np.sum(p[freqs < cut_hz]))
    hi = float(np.sum(p[freqs >= cut_hz]))
    tot = lo + hi
    return lo / tot, hi / tot


def analyze(clean: np.ndarray, est: np.ndarray):
    n = min(clean.size, est.size)
    clean, est = clean[:n].astype(np.float64), est[:n].astype(np.float64)
    out = {}
    out["ssnr"], frames, energies = seg_snr(clean, est)

    alpha = float(np.dot(clean, est) / (np.dot(est, est) + 1e-20))
    out["alpha_opt"] = alpha
    out["ssnr_gain"] = seg_snr(clean, alpha * est)[0]

    lag = best_shift(clean, est)
    out["lag"] = lag
    out["ssnr_shift"] = seg_snr(clean, apply_shift(est, lag))[0]
    out["ssnr_gain_shift"] = seg_snr(clean, alpha * apply_shift(est, lag))[0]

    err = clean - est
    out["err_lo_frac"], out["err_hi_frac"] = band_split_energy(err)
    err_g = clean - alpha * est
    out["err_gain_lo_frac"], out["err_gain_hi_frac"] = band_split_energy(err_g)

    # frame-activity split: speech = top half of nonzero-energy frames
    thresh = np.percentile(energies[energies > 0], 50)
    speech = energies >= thresh
    out["ssnr_speech_frames"] = float(np.mean(frames[speech]))
    out["ssnr_silence_frames"] = float(np.mean(frames[~speech]))
    g_frames = seg_snr(clean, alpha * est)[1]
    out["ssnr_gain_speech_frames"] = float(np.mean(g_frames[speech]))
    out["ssnr_gain_silence_frames"] = float(np.mean(g_frames[~speech]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="reports/trained_generator_r04_ema")
    ap.add_argument("--eval_dir", default="/tmp/qrun_fp32c/eval")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    from cmgan_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(jax.config)

    from cmgan_tpu.checkpoint import restore_variables
    from cmgan_tpu.config import CMGANConfig
    from cmgan_tpu.inference import Enhancer

    cfg = CMGANConfig()
    variables = restore_variables(os.path.abspath(args.model))
    enh = Enhancer(cfg, variables)

    rows = []
    for name in HOLDOUT:
        clean, _ = read_wav(os.path.join(args.eval_dir, "clean", name))
        noisy, _ = read_wav(os.path.join(args.eval_dir, "noisy", name))
        clean, noisy = clean[0].astype(np.float64), noisy[0].astype(np.float64)
        est = enh.enhance(noisy.astype(np.float32)).astype(np.float64)
        row = {"track": name, "enh": analyze(clean, est),
               "noisy": analyze(clean, noisy)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    agg = {
        side: {k: float(np.mean([r[side][k] for r in rows]))
               for k in rows[0]["enh"]}
        for side in ("enh", "noisy")
    }
    print("\n== aggregate ==")
    print(json.dumps(agg, indent=2))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump({"rows": rows, "agg": agg}, fh, indent=2)


if __name__ == "__main__":
    main()
