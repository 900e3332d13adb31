"""Build an augmented training set from a small paired corpus.

Given a directory of matched clean/noisy pairs, multiply it into a much
larger corpus with unseen (clean, noise) combinations. Round 2 used a
single augmentation — cross-mixing each clean track with the noise
residuals (noisy - clean) of OTHER tracks at randomized gains — which
saturates once every (clean, residual) combination has been seen
(held-out PESQ plateaued at ~2.77, VERDICT round 2). Round 3 adds
genuinely new noise families so the noise distribution keeps growing:

  residual       cross-mixed real DEMAND residuals (the round-2 family)
  colored        1/f^beta spectrally-shaped Gaussian noise, beta ~ U[0,2]
                 (white -> pink -> brown)
  speech_shaped  white noise filtered by the smoothed magnitude envelope
                 of a different clean track (speech-spectrum stationary
                 noise, a classic hard case)
  babble         sum of 3-6 random crops of OTHER clean tracks (multi-
                 talker babble, the hardest DEMAND-like category)
  reverb_residual a real residual convolved with a synthetic RIR
                 (tools/make_reverb_dataset.synth_rir), i.e. diffuse
                 reverberant noise

All families are mixed at a target SNR ~ U[snr_lo, snr_hi] dB (default
0-15 dB, the VCTK-DEMAND training range) rather than the round-2 fixed
gain band, so the corpus also sweeps difficulty.

    python tools/make_aug_dataset.py <src_dir> <out_dir> [pairs_per_clean]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cmgan_tpu.data import natsorted, read_wav, write_wav  # noqa: E402

DEFAULT_FAMILIES = (
    ("residual", 0.40),
    ("babble", 0.20),
    ("colored", 0.15),
    ("speech_shaped", 0.15),
    ("reverb_residual", 0.10),
)


def _crop_or_tile(x: np.ndarray, length: int, rng: np.random.Generator) -> np.ndarray:
    if x.size < length:
        x = np.tile(x, -(-length // x.size))
    start = rng.integers(0, x.size - length + 1)
    return x[start: start + length]


def _colored_noise(rng: np.random.Generator, length: int) -> np.ndarray:
    beta = float(rng.uniform(0.0, 2.0))
    spec = np.fft.rfft(rng.standard_normal(length))
    freqs = np.fft.rfftfreq(length)
    freqs[0] = freqs[1]  # avoid div-by-zero at DC
    spec *= freqs ** (-beta / 2.0)
    return np.fft.irfft(spec, length)


def _speech_shaped(rng: np.random.Generator, length: int,
                   other_clean: np.ndarray) -> np.ndarray:
    """White noise filtered by a smoothed magnitude envelope of speech."""
    seg = _crop_or_tile(other_clean, min(other_clean.size, 1 << 16), rng)
    env = np.abs(np.fft.rfft(seg, 1 << 16))
    # smooth the envelope (moving average over ~50 bins) so formant
    # detail becomes a broad speech-spectrum tilt
    k = 51
    env = np.convolve(env, np.ones(k) / k, mode="same") + 1e-12
    spec = np.fft.rfft(rng.standard_normal(length))
    grid = np.linspace(0.0, 1.0, env.size)
    want = np.linspace(0.0, 1.0, spec.size)
    spec *= np.interp(want, grid, env)
    return np.fft.irfft(spec, length)


def _babble(rng: np.random.Generator, length: int,
            cleans: list, exclude: int) -> np.ndarray:
    n_talkers = int(rng.integers(3, 7))
    pool = [j for j in range(len(cleans)) if j != exclude]
    out = np.zeros(length)
    for j in rng.choice(pool, size=n_talkers, replace=True):
        out += _crop_or_tile(cleans[j][1], length, rng)
    return out


def _reverb_residual(rng: np.random.Generator, length: int,
                     residual: np.ndarray) -> np.ndarray:
    from tools.make_reverb_dataset import apply_rir, synth_rir

    rir = synth_rir(rng, rt60=float(rng.uniform(0.2, 0.8)),
                    drr_db=float(rng.uniform(-6.0, 3.0)))
    base = _crop_or_tile(residual, length, rng)
    return apply_rir(base.astype(np.float64), rir).astype(np.float64)


def _mix_at_snr(clean: np.ndarray, noise: np.ndarray, snr_db: float) -> np.ndarray:
    p_clean = float(np.mean(clean * clean)) + 1e-20
    p_noise = float(np.mean(noise * noise)) + 1e-20
    gain = np.sqrt(p_clean / (p_noise * 10.0 ** (snr_db / 10.0)))
    return clean + gain * noise


def build(src_dir: str, out_dir: str, per_clean: int = 20, seed: int = 0,
          families=DEFAULT_FAMILIES, snr_lo: float = 0.0, snr_hi: float = 15.0,
          legacy: bool = False, residual_legacy_gain: bool = False):
    """Write `per_clean` augmented pairs per clean track.

    legacy=True reproduces the round-2 builder exactly (residual family
    only, gain ~ U[0.5, 1.5] instead of SNR targeting).

    residual_legacy_gain=True keeps the multi-family mix but mixes the
    `residual` family at the round-2 gain band (U[0.5, 1.5] on the raw
    residual, i.e. near the source pair's NATURAL SNR) while synthetic
    families use SNR targeting. Rationale (round-3 main run, first
    attempt): retargeting real residuals to SNR ~ U[0, 15] dB skewed
    the corpus harsher than the held-out distribution and monotonically
    DEGRADED held-out PESQ (3.23 -> 3.00 over 5k steps) — the model
    became over-aggressive (CSIG fell first). The natural-SNR residual
    band is the measured-good configuration (QUALITY_r03 S2).
    """
    names = natsorted(os.listdir(os.path.join(src_dir, "clean")))
    cleans, residuals = [], []
    for n in names:
        c, sr = read_wav(os.path.join(src_dir, "clean", n))
        y, _ = read_wav(os.path.join(src_dir, "noisy", n))
        cleans.append((n, c[0].astype(np.float64)))
        residuals.append((y[0] - c[0]).astype(np.float64))

    os.makedirs(os.path.join(out_dir, "clean"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "noisy"), exist_ok=True)
    rng = np.random.default_rng(seed)
    fam_names = [f for f, _ in families]
    fam_p = np.array([w for _, w in families], dtype=np.float64)
    fam_p /= fam_p.sum()
    count = 0
    for i, (name, clean) in enumerate(cleans):
        others = [j for j in range(len(residuals)) if j != i]
        if not others:  # single-pair corpus: no cross-mix sources
            continue
        length = clean.size
        for _ in range(per_clean):
            if legacy:
                fam = "residual"
            else:
                fam = str(rng.choice(fam_names, p=fam_p))
            j = int(rng.choice(others))
            if fam == "residual":
                noise = _crop_or_tile(residuals[j], length, rng)
            elif fam == "colored":
                noise = _colored_noise(rng, length)
            elif fam == "speech_shaped":
                noise = _speech_shaped(rng, length, cleans[j][1])
            elif fam == "babble":
                noise = _babble(rng, length, cleans, exclude=i)
            elif fam == "reverb_residual":
                noise = _reverb_residual(rng, length, residuals[j])
            else:
                raise ValueError(f"unknown noise family {fam!r}")

            if legacy or (residual_legacy_gain and fam == "residual"):
                gain = float(rng.uniform(0.5, 1.5))
                noisy = clean + gain * noise
            else:
                snr = float(rng.uniform(snr_lo, snr_hi))
                noisy = _mix_at_snr(clean, noise, snr)
            # joint rescale (not per-side) if the mix would clip PCM16:
            # training RMS-normalizes per pair, so a common scale is free
            peak = float(np.max(np.abs(noisy)))
            pair_clean = clean
            if peak > 0.99:
                s = 0.99 / peak
                noisy = noisy * s
                pair_clean = clean * s
            stem = name.rsplit(".", 1)[0]
            out = f"{stem}_{fam[:3]}{j}_{count}.wav"
            write_wav(os.path.join(out_dir, "clean", out), pair_clean, 16000)
            write_wav(os.path.join(out_dir, "noisy", out), noisy, 16000)
            count += 1
    print(f"wrote {count} augmented pairs to {out_dir}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("src_dir")
    ap.add_argument("out_dir")
    ap.add_argument("per_clean", type=int, nargs="?", default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--snr_lo", type=float, default=0.0)
    ap.add_argument("--snr_hi", type=float, default=15.0)
    ap.add_argument("--legacy", action="store_true")
    ap.add_argument("--residual_legacy_gain", action="store_true")
    ap.add_argument(
        "--families", default=None,
        help="comma list of fam:weight, e.g. residual:0.6,babble:0.12")
    args = ap.parse_args()
    fams = DEFAULT_FAMILIES
    if args.families:
        fams = tuple(
            (kv.split(":")[0], float(kv.split(":")[1]))
            for kv in args.families.split(",")
        )
    build(args.src_dir, args.out_dir, args.per_clean, seed=args.seed,
          families=fams, snr_lo=args.snr_lo, snr_hi=args.snr_hi,
          legacy=args.legacy, residual_legacy_gain=args.residual_legacy_gain)
