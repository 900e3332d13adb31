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


@functools.lru_cache(maxsize=8)
def _rdft_matrices(n_fft: int):
    """Real-input DFT as two [n_fft, F] matmul operands (numpy, cached)."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@functools.lru_cache(maxsize=8)
def _irdft_matrices(n_fft: int):
    """Onesided inverse DFT as two [F, n_fft] matmul operands.

    x[n] = (1/N) sum_k w_k (Re X_k cos(2*pi*k*n/N) - Im X_k sin(...)),
    with w_k = 2 except w_0 = w_{N/2} = 1 (hermitian fold).
    """
    nf = n_fft // 2 + 1
    k = np.arange(nf)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft
    w = np.full(nf, 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    scale = w[:, None] / n_fft
    return (
        (np.cos(ang) * scale).astype(np.float32),
        (np.sin(ang) * scale).astype(np.float32),
    )


def rdft_matmul(frames: jax.Array, n_fft: int) -> jax.Array:
    """rFFT of the last axis as two MXU matmuls -> complex [..., F].

    Numerically ~1e-5-close to jnp.fft.rfft at n_fft=400 in fp32. Used
    where the fft HLO is unavailable or slow: XLA:CPU's fft thunk
    rejects the layouts shard_map picks when both live in one module
    (the seq-parallel train step), and TPUs have no FFT unit anyway —
    XLA lowers small FFTs onto the MXU much like this, explicitly.
    """
    cos, sin = _rdft_matrices(n_fft)
    re = frames @ jnp.asarray(cos)
    im = frames @ jnp.asarray(sin)  # sin(ang) already carries the -2*pi
    return jax.lax.complex(re, im)


def irdft_matmul(spec: jax.Array, n_fft: int) -> jax.Array:
    """Inverse of `rdft_matmul`: complex [..., F] -> real [..., n_fft]."""
    cos, sin = _irdft_matrices(n_fft)
    return jnp.real(spec) @ jnp.asarray(cos) - jnp.imag(spec) @ jnp.asarray(sin)


def stft(
    x: jax.Array,
    n_fft: int = 400,
    hop: int = 100,
    window: jax.Array | None = None,
    dft_impl: str = "fft",
) -> jax.Array:
    """Onesided centered STFT. x: [..., L] -> complex64 [..., T, F].

    T = L // hop + 1, F = n_fft // 2 + 1. Matches torch.stft output values
    (torch lays them out [..., F, T]; we are time-major).
    dft_impl: 'fft' (jnp.fft.rfft) or 'matmul' (see rdft_matmul).
    """
    if window is None:
        window = hamming_window(n_fft, x.dtype)
    frames = frame_signal(x, n_fft, hop) * window
    if dft_impl == "matmul":
        return rdft_matmul(frames, n_fft)
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
    dft_impl: str = "fft",
) -> jax.Array:
    """Centered inverse STFT with window-square OLA normalization.

    spec: complex [..., T, F] -> [..., (T-1)*hop] (or `length` samples).
    Matches torch.istft(onesided=True, center=True).
    dft_impl: 'fft' (jnp.fft.irfft) or 'matmul' (see irdft_matmul).
    """
    if window is None:
        window = hamming_window(n_fft, jnp.float32)
    num_frames = spec.shape[-2]
    if dft_impl == "matmul":
        frames = irdft_matmul(spec, n_fft) * window
    else:
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
