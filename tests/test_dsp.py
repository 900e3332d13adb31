"""DSP parity tests vs torch.stft/istft (the reference's front-end ops)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cmgan_tpu.dsp import (
    hamming_window,
    istft,
    power_compress,
    power_uncompress,
    rms_normalize,
    stft,
)

N_FFT, HOP = 400, 100


def _torch_stft(x_np):
    x = torch.from_numpy(x_np)
    w = torch.hamming_window(N_FFT)
    out = torch.stft(
        x, N_FFT, HOP, window=w, onesided=True, center=True, return_complex=True
    )
    return out.numpy()  # [B, F, T]


def test_hamming_matches_torch():
    ours = np.asarray(hamming_window(N_FFT))
    theirs = torch.hamming_window(N_FFT).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("length", [32000, 16000, 2000])
def test_stft_matches_torch(rng, length):
    x = rng.standard_normal((2, length)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), N_FFT, HOP))  # [B, T, F]
    theirs = _torch_stft(x).transpose(0, 2, 1)  # -> [B, T, F]
    assert ours.shape == (2, length // HOP + 1, N_FFT // 2 + 1)
    np.testing.assert_allclose(ours.real, theirs.real, atol=2e-4)
    np.testing.assert_allclose(ours.imag, theirs.imag, atol=2e-4)


@pytest.mark.parametrize("length", [32000, 4000])
def test_istft_matches_torch(rng, length):
    x = rng.standard_normal((2, length)).astype(np.float32)
    spec_t = _torch_stft(x)  # [B, F, T]
    w = torch.hamming_window(N_FFT)
    y_torch = torch.istft(
        torch.from_numpy(spec_t), N_FFT, HOP, window=w, onesided=True
    ).numpy()
    y_ours = np.asarray(istft(jnp.asarray(spec_t.transpose(0, 2, 1)), N_FFT, HOP))
    assert y_ours.shape == y_torch.shape == (2, length)
    np.testing.assert_allclose(y_ours, y_torch, atol=2e-4)


def test_stft_istft_roundtrip(rng):
    x = rng.standard_normal((1, 32000)).astype(np.float32)
    y = np.asarray(istft(stft(jnp.asarray(x), N_FFT, HOP), N_FFT, HOP))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_power_compress_matches_reference_semantics(rng):
    # mag**0.3 with phase preserved; inverse recovers the spectrogram.
    spec = rng.standard_normal((3, 21, 11)) + 1j * rng.standard_normal((3, 21, 11))
    spec = spec.astype(np.complex64)
    packed = np.asarray(power_compress(jnp.asarray(spec)))
    assert packed.shape == (3, 21, 11, 2)
    mag = np.abs(spec)
    np.testing.assert_allclose(
        np.hypot(packed[..., 0], packed[..., 1]), mag**0.3, rtol=1e-4, atol=1e-5
    )
    phase = np.angle(spec)
    np.testing.assert_allclose(
        np.arctan2(packed[..., 1], packed[..., 0]), phase, atol=1e-4
    )
    restored = np.asarray(
        power_uncompress(jnp.asarray(packed[..., 0]), jnp.asarray(packed[..., 1]))
    )
    np.testing.assert_allclose(restored.real, spec.real, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(restored.imag, spec.imag, rtol=1e-3, atol=1e-4)


def test_power_compress_zero_bin_is_finite():
    spec = jnp.zeros((1, 4, 4), jnp.complex64)
    packed = np.asarray(power_compress(spec))
    assert np.all(np.isfinite(packed))
    assert np.all(packed == 0.0)


def test_rms_normalize(rng):
    noisy = rng.standard_normal((2, 32000)).astype(np.float32) * 0.1
    clean = rng.standard_normal((2, 32000)).astype(np.float32) * 0.1
    n2, c2, c = rms_normalize(jnp.asarray(noisy), jnp.asarray(clean))
    # Normalized noisy has unit RMS; clean scaled by the same factor.
    np.testing.assert_allclose(
        np.mean(np.asarray(n2) ** 2, axis=-1), 1.0, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(c2), clean * np.asarray(c), rtol=1e-5
    )


def test_matmul_dft_matches_fft():
    """rdft_matmul/irdft_matmul (MXU-matmul DFT, used by seq-sharded
    training where the XLA:CPU fft thunk can't share a module with
    shard_map) agree with the fft HLO path end-to-end."""
    import numpy as np

    from cmgan_tpu.dsp.stft import istft, stft

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 4000)) * 0.5).astype(np.float32)
    s_fft = np.asarray(stft(x, 400, 100))
    s_mm = np.asarray(stft(x, 400, 100, dft_impl="matmul"))
    np.testing.assert_allclose(s_mm, s_fft, atol=2e-4, rtol=1e-4)

    y_fft = np.asarray(istft(jnp.asarray(s_fft), 400, 100))
    y_mm = np.asarray(istft(jnp.asarray(s_fft), 400, 100, dft_impl="matmul"))
    np.testing.assert_allclose(y_mm, y_fft, atol=2e-5, rtol=1e-4)
    # round trip through the matmul path reconstructs the signal
    y_rt = np.asarray(istft(jnp.asarray(s_mm), 400, 100, dft_impl="matmul"))
    np.testing.assert_allclose(y_rt, x[:, : y_rt.shape[-1]], atol=1e-4)
