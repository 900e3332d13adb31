"""WAV I/O and natural-sort tests, including against the reference's
checked-in sample tracks when that mount is present."""

import os

import numpy as np
import pytest

from cmgan_tpu.data import natsorted, read_wav, write_wav

REF_SAMPLES = "/root/reference/AudioSamples"


def test_wav_roundtrip_pcm16(tmp_path, rng):
    x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    assert y.shape == (1, 16000)
    np.testing.assert_allclose(y[0], x, atol=1.0 / 32768)


def test_wav_roundtrip_float(tmp_path, rng):
    x = (rng.standard_normal(1000) * 0.1).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000, subtype="FLOAT")
    y, sr = read_wav(p)
    np.testing.assert_allclose(y[0], x, atol=1e-7)


@pytest.mark.skipif(not os.path.isdir(REF_SAMPLES), reason="reference mount absent")
def test_read_reference_sample_matches_scipy():
    from scipy.io import wavfile

    name = sorted(os.listdir(os.path.join(REF_SAMPLES, "noisy")))[0]
    path = os.path.join(REF_SAMPLES, "noisy", name)
    ours, sr = read_wav(path)
    sr2, theirs = wavfile.read(path)
    assert sr == sr2 == 16000
    # torchaudio/soundfile normalization: int16 / 32768
    np.testing.assert_allclose(
        ours[0], theirs.astype(np.float32) / 32768.0, atol=1e-7
    )


def test_natsorted():
    names = ["p232_10.wav", "p232_2.wav", "p232_1.wav", "p10_1.wav"]
    assert natsorted(names) == [
        "p10_1.wav",
        "p232_1.wav",
        "p232_2.wav",
        "p232_10.wav",
    ]
