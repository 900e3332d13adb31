"""Config presets + 48 kHz long-form model shape checks."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cmgan_tpu.config import CMGANConfig, long_form_48k
from cmgan_tpu.dsp import istft, power_compress, power_uncompress, stft
from cmgan_tpu.models import TSCNet


def test_long_form_preset_values():
    cfg = long_form_48k()
    assert cfg.dsp.sample_rate == 48_000
    assert cfg.dsp.num_freqs == 601
    assert cfg.model.num_features == 601
    assert cfg.model.num_tscb_blocks == 6
    # frame rate matches the 16 kHz config (12.5 ms hop)
    assert cfg.dsp.hop / cfg.dsp.sample_rate == 100 / 16_000


def test_long_form_seq_parallel_wiring():
    """seq_parallel > 1 selects the seq-sharded attention and a 2-axis
    mesh (data x seq); the default stays single-chip 'auto'."""
    from cmgan_tpu.parallel import make_mesh

    assert long_form_48k().model.attention_impl == "auto"
    cfg = long_form_48k(seq_parallel=4)
    assert cfg.model.attention_impl == "seq"
    assert cfg.mesh.seq_parallel == 4
    mesh = make_mesh(cfg.mesh, devices=jax.devices()[:8])
    assert mesh.shape == {"data": 2, "seq": 4}


def test_48k_pipeline_shapes():
    # reduced channels/depth so the CPU test stays fast; the frequency
    # geometry (601 bins -> 301 -> 602 -> 601) is what's under test
    cfg = long_form_48k(num_tscb_blocks=1, num_channels=16)
    cfg = CMGANConfig(
        dsp=cfg.dsp,
        model=dataclasses.replace(
            cfg.model, dense_depth=2, attn_heads=2, num_channels=16
        ),
        train=cfg.train,
        eval=cfg.eval,
        mesh=cfg.mesh,
    )
    dsp = cfg.dsp
    model = TSCNet(cfg.model)
    seg = dsp.sample_rate  # 1 s
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, seg)).astype(np.float32) * 0.1
    )
    spec = stft(x, dsp.n_fft, dsp.hop)
    assert spec.shape == (1, seg // dsp.hop + 1, 601)
    packed = power_compress(spec)
    variables = model.init({"params": jax.random.key(0)}, packed)
    r, i = model.apply(variables, packed)
    assert r.shape == (1, seg // dsp.hop + 1, 601)
    est = istft(power_uncompress(r, i), dsp.n_fft, dsp.hop)
    assert est.shape == (1, seg)
    assert np.all(np.isfinite(np.asarray(est)))
