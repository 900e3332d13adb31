"""Build a dereverberation training set from clean speech.

The reference advertises the same model/recipe for denoising AND
dereverberation (reference: README.md:1-8 — "CMGAN: Conformer-Based
Metric GAN for Monaural Speech Enhancement"; the IEEE TASLP version
trains the identical pipeline on reverberant input). The training
pipeline is data-defined: (clean, degraded) pairs. This tool produces
the degraded side by convolving clean speech with synthetic room
impulse responses:

  RIR(t) = direct tap at t=0
         + sparse early reflections (first ~20 ms, random signs/gains)
         + Gaussian late tail shaped by exp(-6.908 t / RT60)

with RT60 and direct-to-reverberant ratio (DRR) sampled per pair. The
direct tap is pinned at sample 0 so the reverberant signal stays
time-aligned with the dry target — the same alignment contract the
denoising pairs have (dataset crops both sides with one offset,
cmgan_tpu/data/dataset.py).

    python tools/make_reverb_dataset.py <src_dir> <out_dir> [pairs_per_clean]

<src_dir> needs only a clean/ subdir; output is the standard
{clean,noisy}/ pair layout consumed by DemandDataset, so training a
dereverb model is exactly:

    python -m cmgan_tpu.cli.train --data_dir <out_dir> ...
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cmgan_tpu.data import natsorted, read_wav, write_wav  # noqa: E402


def synth_rir(
    rng: np.random.Generator,
    sr: int = 16000,
    rt60: float = 0.5,
    drr_db: float = 0.0,
    n_early: int = 6,
) -> np.ndarray:
    """Synthetic RIR: unit direct tap at 0, early taps, shaped noise tail.

    The tail length covers the -60 dB point (RT60). The tail (plus
    early taps) is scaled so 10*log10(|direct|^2 / sum |reverb|^2) ==
    drr_db.
    """
    n = max(int(rt60 * sr) + 1, sr // 100)
    t = np.arange(n) / sr
    tail = rng.standard_normal(n) * np.exp(-6.908 * t / rt60)
    tail[0] = 0.0
    # sparse early reflections in the first 20 ms (after the direct tap)
    early_span = max(2, int(0.02 * sr))
    idx = rng.integers(1, min(early_span, n), size=n_early)
    tail[idx] += rng.uniform(0.3, 1.0, size=n_early) * rng.choice([-1.0, 1.0], size=n_early)
    energy = float(np.sum(tail * tail))
    if energy > 0:
        tail *= 10.0 ** (-drr_db / 20.0) / np.sqrt(energy)
    rir = tail
    rir[0] = 1.0  # direct path, t=0 => aligned with the dry signal
    return rir


def apply_rir(x: np.ndarray, rir: np.ndarray) -> np.ndarray:
    """FFT convolution, trimmed to len(x) (direct tap at 0 keeps alignment)."""
    m = x.size + rir.size - 1
    nfft = 1 << (m - 1).bit_length()
    y = np.fft.irfft(np.fft.rfft(x, nfft) * np.fft.rfft(rir, nfft), nfft)[: x.size]
    # match the dry signal's level so the pair's RMS normalization
    # (train/steps.py) sees denoising-like dynamics
    rms_x = np.sqrt(np.mean(x * x)) + 1e-12
    rms_y = np.sqrt(np.mean(y * y)) + 1e-12
    return (y * (rms_x / rms_y)).astype(np.float32)


def build(src_dir: str, out_dir: str, per_clean: int = 8, seed: int = 0,
          sr: int = 16000):
    names = natsorted(os.listdir(os.path.join(src_dir, "clean")))
    os.makedirs(os.path.join(out_dir, "clean"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "noisy"), exist_ok=True)
    rng = np.random.default_rng(seed)
    count = 0
    for name in names:
        clean, file_sr = read_wav(os.path.join(src_dir, "clean", name))
        clean = clean[0]
        for _ in range(per_clean):
            rt60 = float(rng.uniform(0.2, 1.0))
            drr = float(rng.uniform(-6.0, 6.0))
            rir = synth_rir(rng, sr=file_sr or sr, rt60=rt60, drr_db=drr)
            reverb = apply_rir(clean, rir)
            stem = name.rsplit(".", 1)[0]
            out = f"{stem}_rt{int(rt60 * 1000)}_{count}.wav"
            write_wav(os.path.join(out_dir, "clean", out), clean, file_sr or sr)
            write_wav(os.path.join(out_dir, "noisy", out), reverb, file_sr or sr)
            count += 1
    print(f"wrote {count} reverberant pairs to {out_dir}")


if __name__ == "__main__":
    per = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    build(sys.argv[1], sys.argv[2], per)
