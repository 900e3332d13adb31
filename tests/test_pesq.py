"""PESQ tests: C++/numpy parity, calibration anchors, monotonicity."""

import os

import numpy as np
import pytest

from cmgan_tpu.data import read_wav
from cmgan_tpu.metrics.pesq_native import native_available, pesq, pesq_batch
from cmgan_tpu.metrics.pesq_ref import pesq_wb_np

REF_SAMPLES = "/root/reference/AudioSamples"
HAVE_SAMPLES = os.path.isdir(REF_SAMPLES)


def _load(kind, name):
    x, sr = read_wav(os.path.join(REF_SAMPLES, kind, name))
    assert sr == 16000
    return x[0].astype(np.float64)


@pytest.mark.skipif(not HAVE_SAMPLES, reason="reference mount absent")
def test_native_matches_numpy_spec():
    if not native_available():
        pytest.skip("no C++ toolchain")
    for name in ["p232_003.wav", "p232_015.wav"]:
        clean = _load("clean", name)
        noisy = _load("noisy", name)
        n = min(clean.size, noisy.size)
        a = pesq(16000, clean[:n], noisy[:n])
        b = pesq_wb_np(clean[:n], noisy[:n])
        assert abs(a - b) < 1e-3, (name, a, b)


@pytest.mark.skipif(not HAVE_SAMPLES, reason="reference mount absent")
def test_clean_ceiling():
    clean = _load("clean", "p232_003.wav")
    assert pesq(16000, clean, clean) == pytest.approx(4.644, abs=0.01)


@pytest.mark.skipif(not HAVE_SAMPLES, reason="reference mount absent")
def test_enhancement_ordering():
    # clean/clean > clean/CMGAN > clean/noisy for every sample pair tested
    for name in ["p232_003.wav", "p232_006.wav", "p232_015.wav"]:
        clean = _load("clean", name)
        noisy = _load("noisy", name)
        enh = _load("CMGAN", name)
        n = min(clean.size, noisy.size, enh.size)
        s_noisy = pesq(16000, clean[:n], noisy[:n])
        s_enh = pesq(16000, clean[:n], enh[:n])
        assert s_enh > s_noisy
        assert 1.0 <= s_noisy < 4.0
        assert s_enh < 4.65


@pytest.mark.skipif(not HAVE_SAMPLES, reason="reference mount absent")
def test_noise_level_monotonicity():
    rng = np.random.default_rng(0)
    clean = _load("clean", "p232_003.wav")
    noise = rng.standard_normal(clean.size) * np.sqrt(np.mean(clean**2))
    scores = [
        pesq(16000, clean, clean + g * noise) for g in (0.01, 0.05, 0.2, 1.0)
    ]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores


@pytest.mark.skipif(not HAVE_SAMPLES, reason="reference mount absent")
def test_batch_matches_single():
    if not native_available():
        pytest.skip("no C++ toolchain")
    clean = _load("clean", "p232_003.wav")[:32000]
    noisy = _load("noisy", "p232_003.wav")[:32000]
    ref = np.stack([clean, clean])
    deg = np.stack([noisy, clean * 0.9])
    out = pesq_batch(ref, deg)
    assert out.shape == (2,)
    assert out[0] == pytest.approx(pesq(16000, clean, noisy), abs=1e-9)


@pytest.mark.skipif(not HAVE_SAMPLES, reason="reference mount absent")
def test_delay_alignment():
    # a 1000-sample delayed copy should still score near the ceiling
    clean = _load("clean", "p232_003.wav")
    delayed = np.concatenate([np.zeros(1000), clean])[: clean.size]
    assert pesq(16000, clean, delayed) > 4.2
