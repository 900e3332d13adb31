"""On-device PESQ vs the native scorer (synchronized pairs)."""

import os

import numpy as np
import pytest

from cmgan_tpu.data import read_wav
from cmgan_tpu.metrics.pesq_jax import pesq_labels_jax, pesq_mos_jax
from cmgan_tpu.metrics.pesq_native import pesq

REF_SAMPLES = "/root/reference/AudioSamples"
HAVE_SAMPLES = os.path.isdir(REF_SAMPLES)


def _load(kind, name, n=None):
    x, sr = read_wav(os.path.join(REF_SAMPLES, kind, name))
    x = x[0].astype(np.float64)
    return x[:n] if n else x


@pytest.mark.skipif(not HAVE_SAMPLES, reason="reference mount absent")
def test_close_to_native_scorer():
    names = ["p232_003.wav", "p232_006.wav", "p232_015.wav"]
    n = 48000
    ref = np.stack([_load("clean", m, n) for m in names])
    for kind in ("noisy", "CMGAN"):
        deg = np.stack([_load(kind, m, n) for m in names])
        jax_scores = np.asarray(pesq_mos_jax(ref, deg))
        native = np.array([pesq(16000, r, d) for r, d in zip(ref, deg)])
        # FFT-domain IIR == lfilter up to truncated tail; f32 vs f64
        np.testing.assert_allclose(jax_scores, native, atol=5e-3)


@pytest.mark.skipif(not HAVE_SAMPLES, reason="reference mount absent")
def test_ceiling_and_ordering():
    clean = _load("clean", "p232_003.wav", 48000)
    noisy = _load("noisy", "p232_003.wav", 48000)
    enh = _load("CMGAN", "p232_003.wav", 48000)
    batch_ref = np.stack([clean, clean, clean])
    batch_deg = np.stack([clean, enh, noisy])
    s = np.asarray(pesq_mos_jax(batch_ref, batch_deg))
    assert s[0] == pytest.approx(4.644, abs=0.01)  # clean/clean ceiling
    assert s[0] > s[1] > s[2]  # clean > enhanced > noisy


def test_labels_flag_degenerate_rows(rng):
    clean = rng.standard_normal((3, 16000)).astype(np.float32) * 0.1
    est = clean + rng.standard_normal((3, 16000)).astype(np.float32) * 0.01
    clean[1] = 0.0  # silent clean -> label -1
    labels = np.asarray(pesq_labels_jax(clean, est))
    assert labels[1] == -1.0
    assert labels[0] > 1.0 and labels[2] > 1.0


def test_differentiable(rng):
    import jax
    import jax.numpy as jnp

    clean = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)
    noise = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.05)

    def neg_mos(scale):
        return -jnp.mean(pesq_mos_jax(clean, clean + scale * noise))

    g = jax.grad(neg_mos)(jnp.float32(1.0))
    # more noise must reduce PESQ -> gradient of negative MOS is positive
    assert np.isfinite(float(g)) and float(g) > 0
