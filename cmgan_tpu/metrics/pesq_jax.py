"""Batched wideband PESQ on TPU (JAX) — on-device training labels.

The reference computes PESQ labels on the host CPU every discriminator
step via a joblib pool (reference: src/models/discriminator.py:18-26),
a synchronous device->host->device round trip on the training critical
path. This module evaluates the same calibrated perceptual model as
cmgan_tpu/native/pesq *inside* the jitted step: the labels for a whole
batch are a few fused FFTs + matmuls on the MXU.

Reformulations vs the scalar spec (pesq_ref.py), chosen so everything
is fixed-shape and parallel:
- the IIR input filters run as zero-padded FFT multiplications over
  the whole waveform (equivalent to lfilter up to a truncated
  impulse-response tail < 1e-20);
- level alignment measures band power with an |H_bp(f)|^2 weight on a
  whole-signal rFFT (Parseval; matches the time-domain measurement);
- time alignment is skipped: training pairs are synchronized by
  construction (est_audio is reconstructed from clean-aligned frames);
- band powers come from one [bins, bands] matmul.

Deviation from the C++ scorer is a few hundredths of a MOS on real
pairs (validated in tests/test_pesq_jax.py). Evaluation reporting
still uses the native scorer.

Because every op here is differentiable, `pesq_mos_jax` also serves as
a perceptual training objective (not available in the reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cmgan_tpu.metrics import pesq_ref as _spec

_FS = _spec._FS
_FRAME = _spec._FRAME
_SHIFT = _spec._SHIFT
_NBANDS = _spec._NBANDS


def _freq_response(b, a, freqs):
    """H(f) of an IIR filter at the given frequencies (numpy, complex)."""
    w = 2.0 * np.pi * freqs / _FS
    z = np.exp(-1j * w)
    num = sum(bk * z**k for k, bk in enumerate(b))
    den = sum(ak * z**k for k, ak in enumerate(a))
    return num / den


def _freq_response_sq(b, a, freqs):
    return np.abs(_freq_response(b, a, freqs)) ** 2


def _fft_iir_filter(x, b, a, tail: int = 4096):
    """Exact IIR filtering via zero-padded FFT multiplication.

    Equivalent to scipy lfilter up to the truncated impulse-response
    tail (< 1e-20 for the PESQ biquads at `tail`=4096). Fully parallel,
    unlike a per-sample scan.
    """
    n = x.shape[-1]
    nfft = 1 << int(np.ceil(np.log2(n + tail)))
    freqs = np.arange(nfft // 2 + 1) * _FS / nfft
    h = np.asarray(_freq_response(b, a, freqs), np.complex64)
    y = jnp.fft.irfft(jnp.fft.rfft(x, nfft, axis=-1) * h, nfft, axis=-1)
    return y[..., :n]


class _JaxConstants:
    """Static tensors shared by every pesq_jax call (host-built once)."""

    def __init__(self):
        c = _spec._constants()
        n_bins = _FRAME // 2 + 1
        freqs = np.arange(n_bins) * _FS / _FRAME

        # bin -> band averaging matrix [n_bins, NBANDS]
        M = np.zeros((n_bins, _NBANDS))
        counts = np.zeros(_NBANDS)
        for k in range(n_bins):
            b = c.band_of_bin[k]
            if c.valid[k]:
                counts[b] += 1
        for k in range(n_bins):
            b = c.band_of_bin[k]
            if c.valid[k]:
                M[k, b] = 1.0 / counts[b]
        # plain numpy: these may be first touched inside a jit trace,
        # where creating jax arrays would leak tracers into the cache
        self.band_matrix = M.astype(np.float32)
        self.width_bark = c.width_bark.astype(np.float32)
        self.abs_thresh = c.abs_thresh.astype(np.float32)
        self.zwicker_exp = c.zwicker_exp.astype(np.float32)
        self.window = (
            0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(_FRAME) / _FRAME))
        ).astype(np.float32)
        self.spec_scale = _FRAME / (_FRAME * 0.375) ** 2

    _cache = None

    @classmethod
    def get(cls):
        if cls._cache is None:
            cls._cache = cls()
        return cls._cache


def _level_scale(x, bp_weight_fn):
    """sqrt(target / band power), band power via whole-signal rFFT."""
    n = x.shape[-1]
    nfft = 1 << int(np.ceil(np.log2(n)))
    spec_pow = jnp.abs(jnp.fft.rfft(x, nfft, axis=-1)) ** 2
    freqs = np.arange(nfft // 2 + 1) * _FS / nfft
    w = bp_weight_fn(freqs)
    # one-sided spectrum: double to count negative frequencies (the
    # 350-3250 Hz measurement band excludes DC and Nyquist)
    band_power = 2.0 * jnp.sum(spec_pow * w, axis=-1) / (float(nfft) * float(n))
    return jnp.sqrt(_spec._TARGET_POWER / jnp.maximum(band_power, 1e-20))


@functools.partial(jax.jit, static_argnames=())
def pesq_mos_jax(ref: jax.Array, deg: jax.Array) -> jax.Array:
    """Batched wideband PESQ MOS-LQO for synchronized pairs.

    ref, deg: [B, N] float 16 kHz waveforms -> [B] scores.
    Fully differentiable w.r.t. `deg`.
    """
    c = _JaxConstants.get()

    bp_sq = functools.partial(
        _freq_response_sq, _spec._BP_B, _spec._BP_A
    )
    ref = ref * _level_scale(ref, bp_sq)[:, None]
    deg = deg * _level_scale(deg, bp_sq)[:, None]
    # exact 100 Hz WB input high-pass (FFT-domain, matches lfilter)
    ref = _fft_iir_filter(ref, _spec._HP_B, _spec._HP_A)
    deg = _fft_iir_filter(deg, _spec._HP_B, _spec._HP_A)

    n = ref.shape[-1]
    n_frames = (n - _FRAME) // _SHIFT + 1
    idx = np.arange(n_frames)[:, None] * _SHIFT + np.arange(_FRAME)[None, :]

    def band_powers(x):
        frames = x[:, idx] * c.window  # [B, F, FRAME]
        pow_spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2 * c.spec_scale
        return pow_spec @ c.band_matrix  # [B, F, NBANDS]

    p_ref = band_powers(ref)
    p_deg = band_powers(deg)

    audible_ref = jnp.sum(
        jnp.where(p_ref > c.abs_thresh, p_ref, 0.0) * c.width_bark, axis=-1
    )  # [B, F]
    active = audible_ref >= 1e5

    # frequency compensation over active frames (fall back to all frames)
    w_act = jnp.where(
        jnp.any(active, axis=1, keepdims=True),
        active.astype(jnp.float32),
        jnp.ones_like(active, jnp.float32),
    )[..., None]
    denom = jnp.sum(w_act, axis=1)
    mean_ref = jnp.sum(p_ref * w_act, axis=1) / denom
    mean_deg = jnp.sum(p_deg * w_act, axis=1) / denom
    band_gain = jnp.clip(
        ((mean_deg + 1000.0) / (mean_ref + 1000.0)) ** 0.2, 0.01, 100.0
    )
    p_ref = p_ref * band_gain[:, None, :]

    # short-term gain compensation, first-order smoothed over frames
    e_ref = jnp.sum(p_ref * c.width_bark, axis=-1)
    e_deg = jnp.sum(p_deg * c.width_bark, axis=-1)
    gain = ((e_ref + 5e3) / (e_deg + 5e3)) ** _spec._GAIN_COMP_EXP

    def smooth(state, g):
        state = 0.8 * state + 0.2 * g
        return state, state

    _, h = jax.lax.scan(smooth, jnp.ones(gain.shape[0]), gain.T)
    h = jnp.clip(h.T, 3e-4, 5.0)
    p_deg = p_deg * h[..., None]

    # Zwicker loudness
    def loudness(p):
        ratio = jnp.maximum(p / c.abs_thresh, 0.0)
        ex = c.zwicker_exp
        return jnp.maximum(
            _spec._LOUDNESS_SCALE
            * (c.abs_thresh / 0.5) ** ex
            * ((0.5 + 0.5 * ratio) ** ex - 1.0),
            0.0,
        )

    l_ref = loudness(p_ref)
    l_deg = loudness(p_deg)

    d = l_deg - l_ref
    mask = 0.25 * jnp.minimum(l_deg, l_ref)
    d_masked = jnp.sign(d) * jnp.maximum(jnp.abs(d) - mask, 0.0)

    asym = ((p_deg + 50.0) / (p_ref + 50.0)) ** 1.2
    asym = jnp.where(asym < 3.0, 0.0, jnp.minimum(asym, 12.0))

    w = c.width_bark
    d_frame = jnp.sqrt(jnp.sum((d_masked * w) ** 2, axis=-1) * _NBANDS)
    da_frame = jnp.sum(jnp.abs(d_masked) * asym * w, axis=-1)

    weight = ((audible_ref + 1e5) / 1e7) ** 0.04
    d_frame = jnp.minimum(d_frame / weight, 45.0)
    da_frame = jnp.minimum(da_frame / weight, 45.0)

    def aggregate(x):
        stride, win = 10, 20
        nf = x.shape[-1]
        if nf < win:
            bursts = jnp.mean(x**6, axis=-1, keepdims=True) ** (1 / 6)
        else:
            nb = (nf - win) // stride + 1
            bidx = np.arange(nb)[:, None] * stride + np.arange(win)[None, :]
            bursts = jnp.mean(x[:, bidx] ** 6, axis=-1) ** (1 / 6)
        return jnp.sqrt(jnp.mean(bursts**2, axis=-1))

    raw = (
        4.5
        - _spec._D_WEIGHT * aggregate(d_frame) ** _spec._D_POWER
        - _spec._DA_WEIGHT * aggregate(da_frame) ** _spec._DA_POWER
    )
    return 0.999 + 4.0 / (1.0 + jnp.exp(-1.3669 * raw + 3.8224))


def pesq_labels_jax(clean: jax.Array, est: jax.Array, batch_valid_floor: float = 1e-12):
    """Training labels on device: scores [B] with -1 for degenerate rows.

    Mirrors the host labeler semantics (pesq_labels_host): silent clean
    or est rows are failures that poison the batch.
    """
    scores = pesq_mos_jax(clean, est)
    energy = jnp.sum(clean * clean, axis=-1) * jnp.sum(est * est, axis=-1)
    bad = ~jnp.isfinite(scores) | (energy <= batch_valid_floor)
    return jnp.where(bad, -1.0, scores)
