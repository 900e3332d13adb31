"""Inference chunking semantics + batched-vs-single equivalence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmgan_tpu.config import CMGANConfig, EvalConfig, ModelConfig
from cmgan_tpu.inference import Enhancer, segment_track
from cmgan_tpu.models import TSCNet


@pytest.fixture(scope="module")
def tiny_enhancer():
    cfg = CMGANConfig(
        model=ModelConfig(
            num_channels=16, num_tscb_blocks=1, dense_depth=2, attn_heads=2
        ),
        eval=EvalConfig(cut_len=8000),  # small cut_len to exercise folding
    )
    model = TSCNet(cfg.model)
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 21, 201, 2)))
    return cfg, Enhancer(cfg, variables)


def test_segment_track_reference_semantics():
    # reference: wrap-pad to hop multiple; fold if longer than cut_len
    # with a batch size that divides hop (src/evaluation.py:25-34)
    x = np.arange(20150, dtype=np.float32)
    segs, padded = segment_track(x, hop=100, cut_len=8000)
    # ceil(20200/8000)=3 -> grows to 4 (divides 100); padding extended
    # to hop-align segments (fixes the reference's latent fold bug)
    assert padded == 20400
    assert segs.shape == (4, 5100)
    assert segs.shape[1] % 100 == 0
    flat = segs.reshape(-1)
    np.testing.assert_array_equal(flat[:20150], x)
    np.testing.assert_array_equal(flat[20150:], x[:250])  # wrap padding


def test_segment_track_short():
    x = np.zeros(7000, np.float32)
    segs, padded = segment_track(x, hop=100, cut_len=8000)
    assert segs.shape == (1, 7000) and padded == 7000


def test_exact_mode_output_length(tiny_enhancer, rng):
    _, enh = tiny_enhancer
    for n in (721, 8000, 20150):
        x = rng.standard_normal(n).astype(np.float32) * 0.1
        y = enh.enhance(x, mode="exact")
        assert y.shape == (n,)
        assert np.all(np.isfinite(y))


def test_batch_matches_single(tiny_enhancer, rng):
    # batched bucketed enhancement must equal per-track bucketed calls
    _, enh = tiny_enhancer
    tracks = [
        rng.standard_normal(n).astype(np.float32) * 0.1
        for n in (5000, 5400, 15000, 7000)
    ]
    batched = enh.enhance_batch(list(tracks), batch_cap=4)
    for t, b in zip(tracks, batched):
        single = enh.enhance(t, mode="bucket")
        np.testing.assert_allclose(b, single, atol=2e-5)


def test_batch_data_sharded_matches_unsharded(tiny_enhancer, rng):
    """Under a data mesh, enhance_batch shards rows over `data` (with
    exact duplicate-row padding) and must reproduce the meshless
    output, including for a track count not divisible by the mesh."""
    from cmgan_tpu.parallel import make_mesh

    cfg, enh = tiny_enhancer
    model = TSCNet(cfg.model)
    variables = enh.variables
    mesh = make_mesh(devices=jax.devices())  # 8-way data axis
    enh_mesh = Enhancer(cfg, variables, mesh=mesh)
    tracks = [
        (rng.standard_normal(n) * 0.1).astype(np.float32)
        for n in (4000, 4000, 7000)  # 3 rows -> padded to 8
    ]
    base = enh.enhance_batch(tracks)
    sharded = enh_mesh.enhance_batch(tracks)
    for a, b in zip(base, sharded):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)
