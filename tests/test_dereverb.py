"""Dereverberation data pipeline (tools/make_reverb_dataset.py).

The reference trains the identical model/recipe for dereverberation
(reference README.md:1-8); here the capability is data-defined, so the
tests pin the data contract: synthetic RIR shape (decay rate, DRR,
direct tap), time alignment of the pair, and that the output layout is
consumable by DemandDataset.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cmgan_tpu.data import read_wav, write_wav
from cmgan_tpu.data.dataset import DemandDataset
from tools.make_reverb_dataset import apply_rir, build, synth_rir


def test_rir_decay_matches_rt60():
    rng = np.random.default_rng(0)
    sr, rt60 = 16000, 0.5
    rir = synth_rir(rng, sr=sr, rt60=rt60, drr_db=0.0, n_early=0)
    tail = rir.copy()
    tail[0] = 0.0
    # energy-decay curve (Schroeder integration) should hit -60 dB at ~rt60
    edc = np.cumsum((tail * tail)[::-1])[::-1]
    edc_db = 10 * np.log10(edc / edc[1] + 1e-30)
    t30 = np.argmax(edc_db <= -30.0) / sr  # -30 dB point => rt60/2
    assert rt60 / 2 * 0.7 < t30 < rt60 / 2 * 1.3


def test_rir_drr():
    rng = np.random.default_rng(1)
    for drr_db in (-6.0, 0.0, 6.0):
        rir = synth_rir(rng, sr=16000, rt60=0.4, drr_db=drr_db)
        reverb_energy = float(np.sum(rir[1:] ** 2))
        got = 10 * np.log10(1.0 / reverb_energy)
        assert abs(got - drr_db) < 0.3


def test_reverb_pair_is_time_aligned():
    """Direct tap at 0 => cross-correlation peak at lag 0 (the dataset
    crops clean/noisy with a single shared offset, so alignment is part
    of the data contract)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal(16000).astype(np.float32) * 0.1
    rir = synth_rir(rng, sr=16000, rt60=0.3, drr_db=3.0)
    y = apply_rir(x, rir)
    assert y.shape == x.shape
    lags = range(-5, 6)
    corr = [float(np.dot(x[100:-100], np.roll(y, l)[100:-100])) for l in lags]
    assert lags[int(np.argmax(corr))] == 0
    # level-matched to the dry target
    assert np.isclose(np.sqrt(np.mean(y * y)), np.sqrt(np.mean(x * x)), rtol=1e-3)


def test_build_layout_feeds_demand_dataset(tmp_path):
    rng = np.random.default_rng(3)
    src = tmp_path / "src"
    os.makedirs(src / "clean")
    for i in range(2):
        x = (rng.standard_normal(12000) * 0.1).astype(np.float32)
        write_wav(str(src / "clean" / f"p{i}_001.wav"), x, 16000)
    out = tmp_path / "reverb"
    build(str(src), str(out), per_clean=3, seed=0)

    names = sorted(os.listdir(out / "clean"))
    assert len(names) == 6 and sorted(os.listdir(out / "noisy")) == names
    ds = DemandDataset(str(out), cut_len=8000)
    clean, noisy, length = ds[0]
    assert clean.shape == noisy.shape == (8000,)
    assert np.isfinite(clean).all() and np.isfinite(noisy).all()
    # reverberant side differs from the dry side but stays level-matched
    assert not np.allclose(clean, noisy)


def test_reverb_enhancement_entry_smoke(tmp_path):
    """End-to-end: a reverberant pair flows through STFT features the
    same way a denoising pair does (no NaNs, finite loss inputs)."""
    import jax.numpy as jnp

    from cmgan_tpu.config import CMGANConfig
    from cmgan_tpu.dsp import power_compress, stft

    rng = np.random.default_rng(4)
    x = rng.standard_normal(16000).astype(np.float32) * 0.1
    rir = synth_rir(rng, sr=16000, rt60=0.6, drr_db=0.0)
    y = apply_rir(x, rir)
    cfg = CMGANConfig()
    spec = power_compress(
        stft(jnp.asarray(y)[None], cfg.dsp.n_fft, cfg.dsp.hop),
        exponent=cfg.dsp.compress_exponent,
    )
    assert bool(jnp.isfinite(spec).all())
