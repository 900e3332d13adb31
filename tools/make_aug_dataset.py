"""Build an augmented training set by cross-mixing noise residuals.

Given a directory of matched clean/noisy pairs, extract each pair's
noise residual (noisy - clean, they are time-aligned) and mix every
clean track with residuals from OTHER tracks at randomized gains. This
multiplies a small paired corpus into a much larger one with unseen
(clean, noise) combinations — a standard speech-enhancement
augmentation, used here to demonstrate generalizing training when the
full VCTK-DEMAND corpus is unavailable.

    python tools/make_aug_dataset.py <src_dir> <out_dir> [pairs_per_clean]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cmgan_tpu.data import natsorted, read_wav, write_wav  # noqa: E402


def build(src_dir: str, out_dir: str, per_clean: int = 20, seed: int = 0):
    names = natsorted(os.listdir(os.path.join(src_dir, "clean")))
    cleans, residuals = [], []
    for n in names:
        c, sr = read_wav(os.path.join(src_dir, "clean", n))
        y, _ = read_wav(os.path.join(src_dir, "noisy", n))
        cleans.append((n, c[0]))
        residuals.append(y[0] - c[0])

    os.makedirs(os.path.join(out_dir, "clean"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "noisy"), exist_ok=True)
    rng = np.random.default_rng(seed)
    count = 0
    for i, (name, clean) in enumerate(cleans):
        others = [j for j in range(len(residuals)) if j != i]
        # with replacement once per_clean exceeds the residual pool:
        # every pick draws a fresh offset and gain, so repeats of the
        # same residual are still distinct mixtures
        picks = rng.choice(others, size=per_clean, replace=per_clean > len(others))
        for j in picks:
            noise = residuals[j]
            # tile/crop the residual to the clean length, random offset
            if noise.size < clean.size:
                noise = np.tile(noise, -(-clean.size // noise.size))
            start = rng.integers(0, noise.size - clean.size + 1)
            noise = noise[start : start + clean.size]
            gain = float(rng.uniform(0.5, 1.5))
            noisy = clean + gain * noise
            stem = name.rsplit(".", 1)[0]
            out = f"{stem}_n{j}_{count}.wav"
            write_wav(os.path.join(out_dir, "clean", out), clean, 16000)
            write_wav(os.path.join(out_dir, "noisy", out), noisy, 16000)
            count += 1
    print(f"wrote {count} augmented pairs to {out_dir}")


if __name__ == "__main__":
    per = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    build(sys.argv[1], sys.argv[2], per)
