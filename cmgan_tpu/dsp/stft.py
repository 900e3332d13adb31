"""STFT / iSTFT front-end with torch-exact semantics, in pure JAX.

Semantics matched against `torch.stft` / `torch.istft` as used by the
reference (src/train.py:81-94,106-112 and src/evaluation.py:36-50):
n_fft=400, hop=100, periodic Hamming window, onesided=True, center=True
(reflect padding), normalized=False.

Layout convention: this framework is **time-major, channels-last**
everywhere — spectrograms are `[..., T, F]` (the reference shuffles between
`[B, F, T, 2]` and `[B, 2, T, F]` with permutes; we pick the layout the
TPU conv/matmul path wants once and keep it).

The overlap-add in `istft` exploits `n_fft % hop == 0`: instead of a
scatter-add (slow on TPU), each frame is split into `n_fft // hop`
hop-sized chunks and the OLA becomes a static sum of shifted pads, which
XLA fuses into a handful of vector ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hamming_window(n_fft: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hamming window, identical to torch.hamming_window(n_fft)."""
    n = np.arange(n_fft)
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / n_fft)
    return jnp.asarray(w, dtype=dtype)


def frame_signal(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Center-pad (reflect) and slice into overlapping frames.

    x: [..., L] -> [..., T, n_fft] with T = L // hop + 1.
    """
    pad = n_fft // 2
    pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    xp = jnp.pad(x, pad_widths, mode="reflect")
    num_frames = x.shape[-1] // hop + 1
    # Static gather indices: [T, n_fft].
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return xp[..., idx]


def stft(x: jax.Array, n_fft: int = 400, hop: int = 100, window: jax.Array | None = None) -> jax.Array:
    """Onesided centered STFT. x: [..., L] -> complex64 [..., T, F].

    T = L // hop + 1, F = n_fft // 2 + 1. Matches torch.stft output values
    (torch lays them out [..., F, T]; we are time-major).
    """
    if window is None:
        window = hamming_window(n_fft, x.dtype)
    frames = frame_signal(x, n_fft, hop) * window
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def _overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """OLA of [..., T, n_fft] frames at stride `hop` -> [..., (T-1)*hop + n_fft].

    Requires n_fft % hop == 0; implemented as a static sum of shifted,
    hop-aligned chunk streams (no scatter).
    """
    *lead, num_frames, n_fft = frames.shape
    assert n_fft % hop == 0, "fast OLA path requires hop | n_fft"
    ratio = n_fft // hop
    out_slots = num_frames + ratio - 1
    # [..., T, ratio, hop]
    chunks = frames.reshape(*lead, num_frames, ratio, hop)
    out = jnp.zeros((*lead, out_slots, hop), frames.dtype)
    for j in range(ratio):
        # chunk j of frame k lands in output slot k + j
        out = out.at[..., j : j + num_frames, :].add(chunks[..., :, j, :])
    return out.reshape(*lead, out_slots * hop)


def istft(
    spec: jax.Array,
    n_fft: int = 400,
    hop: int = 100,
    window: jax.Array | None = None,
    length: int | None = None,
) -> jax.Array:
    """Centered inverse STFT with window-square OLA normalization.

    spec: complex [..., T, F] -> [..., (T-1)*hop] (or `length` samples).
    Matches torch.istft(onesided=True, center=True).
    """
    if window is None:
        window = hamming_window(n_fft, jnp.float32)
    num_frames = spec.shape[-2]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window
    y = _overlap_add(frames, hop)

    # Window-square normalization envelope (same for every batch element).
    wsq = jnp.broadcast_to(window * window, (num_frames, n_fft))
    norm = _overlap_add(wsq, hop)
    y = y / norm

    pad = n_fft // 2
    expected = (num_frames - 1) * hop
    out_len = expected if length is None else length
    return jax.lax.dynamic_slice_in_dim(y, pad, out_len, axis=-1)


@functools.partial(jax.jit, static_argnames=("exponent",))
def power_compress(spec: jax.Array, exponent: float = 0.3) -> jax.Array:
    """Power-law compress a complex spectrogram: mag <- mag**exponent.

    spec: complex [..., T, F] -> real [..., T, F, 2] (re, im channels-last).
    Reference: src/utils.py:20-29 (packs channel-first instead).
    """
    re, im = jnp.real(spec), jnp.imag(spec)
    mag = jnp.sqrt(re * re + im * im)
    phase = jnp.arctan2(im, re)
    cmag = mag**exponent
    return jnp.stack([cmag * jnp.cos(phase), cmag * jnp.sin(phase)], axis=-1)


@functools.partial(jax.jit, static_argnames=("exponent",))
def power_uncompress(re: jax.Array, im: jax.Array, exponent: float = 0.3) -> jax.Array:
    """Invert power-law compression -> complex [..., T, F].

    Reference: src/utils.py:32-39.
    """
    mag = jnp.sqrt(re * re + im * im)
    phase = jnp.arctan2(im, re)
    umag = mag ** (1.0 / exponent)
    return jax.lax.complex(umag * jnp.cos(phase), umag * jnp.sin(phase))


def rms_normalize(noisy: jax.Array, clean: jax.Array | None = None):
    """Scale by c = sqrt(L / sum(noisy^2)), computed from noisy only.

    Applied to both noisy and clean so loss scales match; invert at
    inference with est / c. Reference: src/train.py:75-79,
    src/evaluation.py:21-23,51.
    Returns (noisy*c, clean*c, c) — c has shape [..., 1].
    """
    length = noisy.shape[-1]
    c = jnp.sqrt(length / jnp.sum(noisy * noisy, axis=-1, keepdims=True))
    if clean is None:
        return noisy * c, c
    return noisy * c, clean * c, c
