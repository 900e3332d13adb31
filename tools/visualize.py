"""Qualitative comparison plots: waveform, TF magnitude, and phase.

The reference ships static comparison figures (Visualizations/README.md)
contrasting time-domain, TF-magnitude and TF-phase behavior; this tool
generates the same three-row panel for any set of tracks. Phase is
rendered as the baseband phase difference (BPD) — phase after removing
the per-bin carrier rotation expected from the hop — which exposes
structure plain phase hides (Visualizations/README.md references
Krawczyk & Gerkmann's approach).

    python tools/visualize.py out.png noisy.wav enhanced.wav clean.wav
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def baseband_phase_difference(spec: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """BPD of a complex spectrogram [T, F]: frame-to-frame phase delta
    minus the expected carrier advance 2*pi*hop*f/n_fft, wrapped."""
    phase = np.angle(spec)
    delta = np.diff(phase, axis=0)
    freqs = np.arange(spec.shape[1])
    carrier = 2.0 * np.pi * hop * freqs / n_fft
    bpd = delta - carrier[None, :]
    return np.angle(np.exp(1j * bpd))  # wrap to [-pi, pi]


def make_figure(paths: list[str], out_path: str, labels: list[str] | None = None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cmgan_tpu.config import DSPConfig
    from cmgan_tpu.data import read_wav
    from cmgan_tpu.dsp import stft

    dsp = DSPConfig()
    labels = labels or [os.path.basename(p) for p in paths]
    n = len(paths)
    fig, axes = plt.subplots(3, n, figsize=(4 * n, 9), squeeze=False)

    for col, (path, label) in enumerate(zip(paths, labels)):
        x, sr = read_wav(path)
        x = x[0]
        t = np.arange(x.size) / sr
        spec = np.asarray(stft(x[None, :], dsp.n_fft, dsp.hop))[0]  # [T, F]
        mag_db = 20.0 * np.log10(np.abs(spec) + 1e-8)
        bpd = baseband_phase_difference(spec, dsp.n_fft, dsp.hop)
        extent = [0, x.size / sr, 0, sr / 2000.0]

        axes[0][col].plot(t, x, linewidth=0.3)
        axes[0][col].set_title(label)
        axes[0][col].set_ylim(-1.05 * np.abs(x).max(), 1.05 * np.abs(x).max())
        axes[0][col].set_xlabel("time [s]")

        axes[1][col].imshow(
            mag_db.T, origin="lower", aspect="auto", extent=extent,
            vmin=mag_db.max() - 80, vmax=mag_db.max(), cmap="magma",
        )
        axes[1][col].set_ylabel("kHz")
        axes[1][col].set_title("magnitude [dB]")

        axes[2][col].imshow(
            bpd.T, origin="lower", aspect="auto", extent=extent,
            vmin=-np.pi, vmax=np.pi, cmap="twilight",
        )
        axes[2][col].set_ylabel("kHz")
        axes[2][col].set_title("baseband phase difference")

    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print(out_path)


if __name__ == "__main__":
    make_figure(sys.argv[2:], sys.argv[1])
