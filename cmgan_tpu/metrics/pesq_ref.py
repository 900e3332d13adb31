"""Wideband PESQ (ITU-T P.862.2 structure) — numpy reference model.

A from-scratch implementation of the perceptual evaluation pipeline:
level alignment, 100 Hz pre-filter, time alignment, Bark-domain
perceptual model (frequency/gain compensation, Zwicker loudness),
asymmetric disturbance aggregation and the P.862.2 logistic MOS-LQO
mapping. Replaces the `pesq` C wheel the reference depends on
(reference: src/models/discriminator.py:11, src/tools/compute_metrics.py:62).

This numpy version is the behavioral spec for the C++ library in
cmgan_tpu/native/pesq (bit-parity tested against it) and for the
batched JAX version used for on-TPU training labels.

NOTE on fidelity: the ITU reference constants tables are not
redistributable here; band partitions and hearing thresholds are
derived from the published formulas (Bark warping z = 7*asinh(f/650),
Terhardt threshold-in-quiet) and the final scale is calibrated on
anchor material. Scores track P.862.2 closely in ranking and
calibration range [1.04, 4.64] but are not bit-identical to the wheel.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import lfilter

_FS = 16_000
_FRAME = 512  # 32 ms
_SHIFT = 256
_NBANDS = 49
_TARGET_POWER = 1e7  # level-alignment target band power
_ZWICKER_EXP = 0.23
_LOUDNESS_SCALE = 0.1866055  # Sl loudness scale
_GAIN_COMP_EXP = 0.5  # partial short-term gain compensation strength
# Disturbance -> raw-MOS mapping, calibrated PER-TRACK against the ITU
# `pesq` wheel: the reference repo checks in wheel PESQ for all 824
# VCTK-DEMAND test tracks (src/tools/Noisy_metrics_results/
# python_noisy_metrics.log) and 25 of those tracks' wavs are present in
# AudioSamples/, giving 25 exact ITU anchor values. The fit (see
# tools/pesq_calibrate.py, report in CALIBRATION.md) minimizes MOS error
# over those anchors with the d-term share of the mean drop constrained
# to >=50% so BOTH terms stay live off-corpus (the additive-noise corpus
# alone cannot identify them separately):
#   fit MAE 0.12, leave-one-out MAE 0.14, bias +0.003, Spearman 0.99
# (the round-1 two-aggregate calibration scored MAE 0.43 per track).
_D_WEIGHT = 1.41e-05
_D_POWER = 3.2379832
_DA_WEIGHT = 0.4424533
_DA_POWER = 0.296617


def _bark(f):
    return 7.0 * np.arcsinh(f / 650.0)


def _bark_inv(z):
    return 650.0 * np.sinh(z / 7.0)


def _hearing_threshold_db(f):
    """Threshold in quiet (Terhardt 1979), dB SPL."""
    f = np.maximum(f, 20.0) / 1000.0
    return (
        3.64 * f**-0.8
        - 6.5 * np.exp(-0.6 * (f - 3.3) ** 2)
        + 1e-3 * f**4
    )


class _PerceptualConstants:
    """Precomputed band structure for 16 kHz wideband mode."""

    def __init__(self):
        n_bins = _FRAME // 2 + 1
        freqs = np.arange(n_bins) * _FS / _FRAME
        z_edges = np.linspace(_bark(100.0), _bark(8000.0), _NBANDS + 1)
        f_edges = _bark_inv(z_edges)
        # bin -> band assignment (bins below 100 Hz are dropped, as the
        # wideband mode high-passes them anyway)
        self.band_of_bin = np.digitize(freqs, f_edges) - 1
        self.valid = (self.band_of_bin >= 0) & (self.band_of_bin < _NBANDS)
        self.width_bark = np.diff(z_edges)  # uniform
        self.width_hz = np.diff(f_edges)
        centers = 0.5 * (f_edges[1:] + f_edges[:-1])
        self.center_freq = centers
        # absolute hearing threshold as band power (relative scale)
        thr_db = _hearing_threshold_db(centers)
        self.abs_thresh = 10.0 ** (thr_db / 10.0)
        # low-frequency Zwicker exponent correction (below ~4 bark)
        self.zwicker_exp = np.where(
            _bark(centers) < 4.0,
            _ZWICKER_EXP * (1.0 + 0.5 * (4.0 - _bark(centers)) / 4.0),
            _ZWICKER_EXP,
        )

    def band_powers(self, power_spectrum):
        """[frames, bins] -> [frames, bands] mean power per band."""
        n_frames = power_spectrum.shape[0]
        out = np.zeros((n_frames, _NBANDS))
        counts = np.zeros(_NBANDS)
        np.add.at(counts, self.band_of_bin[self.valid], 1.0)
        for b in range(_NBANDS):
            sel = self.valid & (self.band_of_bin == b)
            if np.any(sel):
                out[:, b] = np.mean(power_spectrum[:, sel], axis=1)
        return out


_CONST = None


def _constants():
    global _CONST
    if _CONST is None:
        _CONST = _PerceptualConstants()
    return _CONST


# 100 Hz 2nd-order Butterworth high-pass at 16 kHz; denominator matches
# the published P.862.2 wideband input SOS (…, -1.9444777, 0.94597794).
_HP_B = (0.9726138984998438, -1.9452277969996876, 0.9726138984998438)
_HP_A = (1.0, -1.9444776577670935, 0.9459779362322813)


def _wb_input_filter(x):
    """P.862.2 wideband pre-filter: 2nd-order 100 Hz IIR high-pass."""
    return lfilter(_HP_B, _HP_A, x)


# 350-3250 Hz 2nd-order Butterworth band-pass at 16 kHz, used only to
# measure the level-alignment band power (time-domain; portable).
_BP_B = (
    0.17700538222951706, 0.0, -0.3540107644590341, 0.0, 0.17700538222951706,
)
_BP_A = (
    1.0, -2.266085202402198, 1.9183268001686336,
    -0.8538508436231806, 0.21791242519290044,
)


def _level_align(x):
    """Scale so mean power over the 350-3250 Hz band hits the target."""
    banded = lfilter(_BP_B, _BP_A, x)
    band_power = np.mean(banded * banded)
    return x * np.sqrt(_TARGET_POWER / max(band_power, 1e-20))


def _crude_align(ref, deg):
    """Global delay estimate via envelope cross-correlation (FFT-based)."""
    max_delay = min(_FS // 2, min(ref.size, deg.size) - _FRAME)
    if max_delay <= 0:
        return 0
    n = 1 << int(np.ceil(np.log2(ref.size + deg.size)))
    env_r = np.abs(ref)
    env_d = np.abs(deg)
    R = np.fft.rfft(env_r, n)
    D = np.fft.rfft(env_d, n)
    xc = np.fft.irfft(D * np.conj(R), n)
    lags = np.arange(-max_delay, max_delay)  # same scan order as the C++ port
    best = lags[np.argmax(xc[lags % n])]
    return int(best)


def _frames_power_spectrum(x):
    n_frames = (x.size - _FRAME) // _SHIFT + 1
    idx = np.arange(n_frames)[:, None] * _SHIFT + np.arange(_FRAME)[None, :]
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(_FRAME) / _FRAME))
    frames = x[idx] * w
    return np.abs(np.fft.rfft(frames, axis=1)) ** 2 / (_FRAME * 0.375) ** 2 * _FRAME


def pesq_wb_np(
    ref: np.ndarray,
    deg: np.ndarray,
    sample_rate: int = 16000,
    _return_disturbances: bool = False,
):
    """Wideband PESQ MOS-LQO for 16 kHz signals in [-1, 1] or int16 scale."""
    if sample_rate != _FS:
        raise ValueError("wideband PESQ requires 16 kHz input")
    ref = np.asarray(ref, np.float64).reshape(-1)
    deg = np.asarray(deg, np.float64).reshape(-1)
    n = min(ref.size, deg.size)
    ref, deg = ref[:n], deg[:n]

    c = _constants()

    # 1. level + input filtering
    ref = _level_align(ref)
    deg = _level_align(deg)
    ref = _wb_input_filter(ref)
    deg = _wb_input_filter(deg)

    # 2. time alignment (global; enhancement pairs are synchronized)
    delay = _crude_align(ref, deg)
    if delay > 0:
        deg = deg[delay:]
        ref = ref[: deg.size]
    elif delay < 0:
        ref = ref[-delay:]
        deg = deg[: ref.size]

    # 3. Bark band powers per frame
    p_ref = c.band_powers(_frames_power_spectrum(ref))
    p_deg = c.band_powers(_frames_power_spectrum(deg))
    n_frames = p_ref.shape[0]
    if n_frames == 0:
        return 1.0

    audible_ref = np.sum(
        np.where(p_ref > c.abs_thresh, p_ref, 0.0) * c.width_bark, axis=1
    )
    silent = audible_ref < 1e5  # frames with (nearly) no reference speech

    # 4. frequency compensation: partially equalize REF toward DEG's
    # time-averaged spectral shape (piecewise linear response estimate)
    active = ~silent
    if np.any(active):
        mean_ref = np.mean(p_ref[active], axis=0)
        mean_deg = np.mean(p_deg[active], axis=0)
    else:
        mean_ref = np.mean(p_ref, axis=0)
        mean_deg = np.mean(p_deg, axis=0)
    band_gain = np.clip(
        ((mean_deg + 1000.0) / (mean_ref + 1000.0)) ** 0.2, 0.01, 100.0
    )
    p_ref_eq = p_ref * band_gain[None, :]

    # 5. short-term gain compensation: partially equalize DEG frame energy
    # toward REF with first-order smoothing
    e_ref = np.sum(p_ref_eq * c.width_bark, axis=1)
    e_deg = np.sum(p_deg * c.width_bark, axis=1)
    gain = ((e_ref + 5e3) / (e_deg + 5e3)) ** _GAIN_COMP_EXP
    h = np.empty(n_frames)
    state = 1.0
    for t in range(n_frames):
        state = 0.8 * state + 0.2 * gain[t]
        h[t] = state
    h = np.clip(h, 3e-4, 5.0)
    p_deg_eq = p_deg * h[:, None]

    # 6. Zwicker loudness
    def loudness(p):
        ratio = np.maximum(p / c.abs_thresh, 0.0)
        ex = c.zwicker_exp[None, :]
        l = (
            _LOUDNESS_SCALE
            * (c.abs_thresh / 0.5) ** ex
            * ((0.5 + 0.5 * ratio) ** ex - 1.0)
        )
        return np.maximum(l, 0.0)

    l_ref = loudness(p_ref_eq)
    l_deg = loudness(p_deg_eq)

    # 7. disturbance with masking
    d = l_deg - l_ref
    mask = 0.25 * np.minimum(l_deg, l_ref)
    d_masked = np.sign(d) * np.maximum(np.abs(d) - mask, 0.0)

    # asymmetry factor: added (noise) distortions weigh more than removed
    asym = ((p_deg_eq + 50.0) / (p_ref_eq + 50.0)) ** 1.2
    asym = np.where(asym < 3.0, 0.0, np.minimum(asym, 12.0))

    w = c.width_bark[None, :]
    d_frame = np.sqrt(np.sum((d_masked * w) ** 2, axis=1) * _NBANDS)
    da_frame = np.sum(np.abs(d_masked) * asym * w, axis=1)

    # emphasis: quiet-reference frames carry less weight
    weight = ((audible_ref + 1e5) / 1e7) ** 0.04
    d_frame = np.minimum(d_frame / weight, 45.0)
    da_frame = np.minimum(da_frame / weight, 45.0)

    # 8. two-stage Lp aggregation: L6 over 20-frame bursts, L2 overall
    def aggregate(x):
        stride = 10  # 50% overlapped 20-frame bursts
        if x.size < 20:
            bursts = np.array([np.mean(x**6) ** (1 / 6)])
        else:
            n_bursts = (x.size - 20) // stride + 1
            idx = np.arange(n_bursts)[:, None] * stride + np.arange(20)[None, :]
            bursts = np.mean(x[idx] ** 6, axis=1) ** (1 / 6)
        return np.sqrt(np.mean(bursts**2))

    d_total = aggregate(d_frame)
    da_total = aggregate(da_frame)

    if _return_disturbances:
        return float(d_total), float(da_total)
    raw = (
        4.5
        - _D_WEIGHT * d_total**_D_POWER
        - _DA_WEIGHT * da_total**_DA_POWER
    )
    # P.862.2 wideband logistic mapping to MOS-LQO
    return float(0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224)))
