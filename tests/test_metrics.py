"""Metric-suite tests: invariants + numerical parity vs the reference
implementation (loaded dynamically from the read-only mount, PESQ
dependency stripped — nothing is copied into this repo)."""

import os

import numpy as np
import pytest

from cmgan_tpu.data import read_wav
from cmgan_tpu.metrics import composite_scores, llr, snr, stoi, wss

REF_METRICS = "/root/reference/src/tools/compute_metrics.py"
REF_SAMPLES = "/root/reference/AudioSamples"


def _load_reference_metrics():
    """Exec the reference metric module with the pesq import stubbed."""
    src = open(REF_METRICS).read().replace("from pesq import pesq", "pesq = None")
    ns = {}
    exec(compile(src, REF_METRICS, "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def ref():
    if not os.path.isfile(REF_METRICS):
        pytest.skip("reference mount absent")
    return _load_reference_metrics()


@pytest.fixture(scope="module")
def track_pair():
    if not os.path.isdir(REF_SAMPLES):
        pytest.skip("reference mount absent")
    clean, _ = read_wav(os.path.join(REF_SAMPLES, "clean", "p232_003.wav"))
    noisy, _ = read_wav(os.path.join(REF_SAMPLES, "noisy", "p232_003.wav"))
    return clean[0].astype(np.float64), noisy[0].astype(np.float64)


def test_wss_parity(ref, track_pair):
    clean, noisy = track_pair
    ours = wss(clean, noisy, 16000)
    theirs = ref["wss"](clean, noisy, 16000)
    np.testing.assert_allclose(ours, theirs, rtol=1e-8)


def test_llr_parity(ref, track_pair):
    clean, noisy = track_pair
    ours = llr(clean, noisy, 16000)
    theirs = ref["llr"](clean, noisy, 16000)
    # both may contain NaN on silent frames — compare as equal_nan
    np.testing.assert_allclose(ours, theirs, rtol=1e-7, equal_nan=True)


def test_snr_parity(ref, track_pair):
    clean, noisy = track_pair
    o_snr, o_seg = snr(clean, noisy, 16000)
    t_snr, t_seg = ref["snr"](clean, noisy, 16000)
    assert abs(o_snr - t_snr) < 1e-9
    np.testing.assert_allclose(o_seg, t_seg, rtol=1e-9)


def test_stoi_parity(ref, track_pair):
    clean, noisy = track_pair
    assert abs(stoi(clean, noisy, 16000) - ref["stoi"](clean, noisy, 16000)) < 1e-9


def test_stoi_parity_synthetic(ref, rng):
    # exercise silent-frame removal with a constructed quiet region
    clean = rng.standard_normal(30000) * 0.1
    clean[8000:16000] *= 1e-4
    noisy = clean + rng.standard_normal(30000) * 0.02
    assert abs(stoi(clean, noisy, 16000) - ref["stoi"](clean, noisy, 16000)) < 1e-9


def test_clean_vs_clean_invariants(track_pair):
    clean, _ = track_pair
    _, seg = snr(clean, clean + 1e-12, 16000)
    assert np.mean(seg) == pytest.approx(35.0)  # max segmental SNR clamp
    w = wss(clean, clean, 16000)
    assert np.nanmax(np.abs(w)) < 1e-12
    assert stoi(clean, clean, 16000) == pytest.approx(1.0, abs=1e-6)


def test_enhanced_beats_noisy(track_pair):
    # The reference's released CMGAN output should dominate the noisy floor.
    clean, noisy = track_pair
    enh, _ = read_wav(os.path.join(REF_SAMPLES, "CMGAN", "p232_003.wav"))
    enh = enh[0].astype(np.float64)
    n = min(clean.size, enh.size)
    _, seg_noisy = snr(clean[:n], noisy[:n], 16000)
    _, seg_enh = snr(clean[:n], enh[:n], 16000)
    assert np.mean(seg_enh) > np.mean(seg_noisy) + 3.0
    assert stoi(clean[:n], enh[:n], 16000) > stoi(clean[:n], noisy[:n], 16000) - 0.01


def test_composite_scores_clamped():
    assert composite_scores(10.0, 0.0, 0.0, 35.0) == (5.0, 5.0, 5.0)
    assert composite_scores(-10.0, 10.0, 1000.0, -10.0) == (1.0, 1.0, 1.0)
