"""Streaming enhancer tests (tiny model, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmgan_tpu.config import CMGANConfig, ModelConfig
from cmgan_tpu.models import TSCNet
from cmgan_tpu.streaming import StreamingEnhancer


@pytest.fixture(scope="module")
def tiny():
    cfg = CMGANConfig(
        model=ModelConfig(
            num_channels=16, num_tscb_blocks=1, dense_depth=2, attn_heads=2, ndf=4
        )
    )
    model = TSCNet(cfg.model)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 21, 201, 2))
    )
    return cfg, variables


def _make_enhancer(cfg, variables):
    return StreamingEnhancer(
        cfg, variables, chunk=2000, left_context=6000, lookahead=1000, crossfade=200
    )


def test_stream_length_and_alignment(tiny, rng):
    cfg, variables = tiny
    s = _make_enhancer(cfg, variables)
    n = 17_300  # not a multiple of chunk
    x = rng.standard_normal(n).astype(np.float32) * 0.1
    outs = [s.push(x[:5000]), s.push(x[5000:12000]), s.push(x[12000:]), s.flush()]
    y = np.concatenate(outs)
    assert y.shape == (n,)
    assert np.all(np.isfinite(y))
    assert float(np.sqrt(np.mean(y**2))) > 1e-4  # non-degenerate output


@pytest.mark.parametrize("emit", ["wola", "crossfade"])
def test_stream_matches_blockwise_invariance(tiny, rng, emit):
    # same input through different push block sizes -> identical output
    cfg, variables = tiny
    x = rng.standard_normal(12_000).astype(np.float32) * 0.1

    s1 = StreamingEnhancer(
        cfg, variables, chunk=2000, left_context=6000, lookahead=1000,
        crossfade=200, emit=emit,
    )
    y1 = np.concatenate([s1.push(x), s1.flush()])

    s2 = StreamingEnhancer(
        cfg, variables, chunk=2000, left_context=6000, lookahead=1000,
        crossfade=200, emit=emit,
    )
    parts = [s2.push(x[i : i + 700]) for i in range(0, x.size, 700)]
    parts.append(s2.flush())
    y2 = np.concatenate(parts)

    np.testing.assert_allclose(y1, y2, atol=1e-6)


@pytest.mark.parametrize("chunk,lookahead", [(2000, 1000), (2000, 2000), (1000, 2000)])
def test_wola_weights_cover_every_sample(tiny, chunk, lookahead):
    """The shifted wola weight profiles sum to a constant over the
    emitted chunk once the stream is warm (lookahead<=chunk: exactly 1;
    lookahead>chunk: constant >1, normalized away at emission)."""
    cfg, variables = tiny
    s = StreamingEnhancer(
        cfg, variables, chunk=chunk, left_context=4000, lookahead=lookahead,
        emit="wola",
    )
    w = s._wola_w
    total = np.zeros(chunk)
    k = 0
    while k * chunk < w.size:
        seg = w[k * chunk : k * chunk + chunk]
        total[: seg.size] += seg
        k += 1
    np.testing.assert_allclose(total, total[0], atol=1e-6)
    assert total[0] >= 1.0 - 1e-6


def test_wola_multi_contributor_stream(tiny, rng):
    """lookahead > chunk: every sample blends three window estimates;
    output stays aligned, finite, and non-degenerate."""
    cfg, variables = tiny
    s = StreamingEnhancer(
        cfg, variables, chunk=1000, left_context=4000, lookahead=2000,
        emit="wola",
    )
    n = 9_500
    x = rng.standard_normal(n).astype(np.float32) * 0.1
    y = np.concatenate([s.push(x), s.flush()])
    assert y.shape == (n,)
    assert np.all(np.isfinite(y))
    assert float(np.sqrt(np.mean(y**2))) > 1e-4


def test_wola_zero_lookahead_falls_back_to_crossfade(tiny):
    cfg, variables = tiny
    s = StreamingEnhancer(
        cfg, variables, chunk=2000, left_context=6000, lookahead=0, emit="wola"
    )
    assert s.emit == "crossfade"


def test_latency_property(tiny):
    cfg, variables = tiny
    s = _make_enhancer(cfg, variables)
    assert s.latency_samples == 3000  # chunk + lookahead
    # the enhancer cannot emit sample i before having seen i + lookahead
    out = s.push(np.zeros(2000, np.float32))
    assert out.size <= 2000


def test_reset(tiny, rng):
    cfg, variables = tiny
    s = _make_enhancer(cfg, variables)
    x = rng.standard_normal(8000).astype(np.float32) * 0.1
    y1 = np.concatenate([s.push(x), s.flush()])
    s.reset()
    y2 = np.concatenate([s.push(x), s.flush()])
    np.testing.assert_allclose(y1, y2, atol=1e-6)


def test_multi_stream_lockstep_matches_single(tiny, rng):
    cfg, variables = tiny
    xs = rng.standard_normal((3, 9000)).astype(np.float32) * 0.1

    multi = StreamingEnhancer(
        cfg, variables, chunk=2000, left_context=6000, lookahead=1000,
        crossfade=200, num_streams=3,
    )
    y_multi = np.concatenate([multi.push(xs), multi.flush()], axis=1)
    assert y_multi.shape == (3, 9000)

    for i in range(3):
        single = _make_enhancer(cfg, variables)
        y_single = np.concatenate([single.push(xs[i]), single.flush()])
        np.testing.assert_allclose(y_multi[i], y_single, atol=1e-5)


def test_window_program_shared_across_instances(tiny):
    """Two enhancers with the same config share ONE jitted window fn
    (per-connection instances in cli/serve.py must not re-trace)."""
    from cmgan_tpu.streaming import _window_fn

    cfg, variables = tiny
    a = StreamingEnhancer(cfg, variables, chunk=800, left_context=800,
                          lookahead=400, crossfade=80)
    b = StreamingEnhancer(cfg, variables, chunk=400, left_context=1200,
                          lookahead=400, crossfade=80)
    assert a._enhance_window is b._enhance_window
    assert a._enhance_window is _window_fn(cfg, None)


# ---------------------------------------------------------------------------
# StreamBatcher: slot-based serving engine


def _chunks(x, n):
    return [x[i : i + n] for i in range(0, x.size, n)]


def test_batcher_slot_matches_solo_enhancer(tiny, rng):
    """A slot's output depends only on its own chunk sequence: equal to
    a solo StreamingEnhancer even with other slots active and the slot
    skipping ticks."""
    from cmgan_tpu.streaming import StreamBatcher

    cfg, variables = tiny
    kw = dict(chunk=2000, left_context=6000, lookahead=1000)
    n = 8000
    xa = rng.standard_normal(n).astype(np.float32) * 0.1
    xb = rng.standard_normal(n).astype(np.float32) * 0.2

    solo = StreamingEnhancer(cfg, variables, **kw)
    ref = np.concatenate([solo.push(xa), solo.flush()])

    b = StreamBatcher(cfg, variables, num_slots=3, **kw)
    sa, sb = b.open(), b.open()
    outs_a = []
    a_chunks = _chunks(xa, 2000)
    b_chunks = _chunks(xb, 2000)
    # interleave: a ticks on every step, b only on even steps (stalls),
    # plus drain ticks for a's lookahead tail
    drain = -(-1000 // 2000) + 1
    zeros = np.zeros(2000, np.float32)
    for t in range(len(a_chunks) + drain):
        blocks = {}
        blocks[sa] = a_chunks[t] if t < len(a_chunks) else zeros
        if t % 2 == 0 and t // 2 < len(b_chunks):
            blocks[sb] = b_chunks[t // 2]
        out = b.step(blocks)
        outs_a.append(out[sa])
    got = np.concatenate(outs_a)[:n]
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_batcher_slot_reuse_resets_state(tiny, rng):
    """close + open must hand back a slot with fresh state: a reused
    slot reproduces a fresh stream's output."""
    from cmgan_tpu.streaming import StreamBatcher

    cfg, variables = tiny
    kw = dict(chunk=2000, left_context=6000, lookahead=1000)
    x = rng.standard_normal(4000).astype(np.float32) * 0.1

    def run(b, slot_expected=None):
        s = b.open()
        if slot_expected is not None:
            assert s == slot_expected
        outs = [b.step({s: c})[s] for c in _chunks(x, 2000)]
        outs += [b.step({s: np.zeros(2000, np.float32)})[s] for _ in range(2)]
        b.close(s)
        return np.concatenate(outs)[: x.size]

    b = StreamBatcher(cfg, variables, num_slots=1, **kw)
    first = run(b, slot_expected=0)
    second = run(b, slot_expected=0)  # same physical slot, reused
    np.testing.assert_allclose(first, second, atol=1e-6)


def test_batcher_slot_exhaustion_and_shape_checks(tiny):
    from cmgan_tpu.streaming import StreamBatcher

    cfg, variables = tiny
    b = StreamBatcher(
        cfg, variables, num_slots=2, chunk=2000, left_context=6000,
        lookahead=1000,
    )
    b.open(), b.open()
    with pytest.raises(RuntimeError):
        b.open()
    assert b.step({}) == {}


def test_window_fn_threads_dft_impl(tiny):
    """Streaming must honor cfg.dsp.dft_impl (round-3 advisor finding):
    a matmul-DFT config's window program contains no fft HLO (so
    seq-sharded CPU inference can't hit the fft+shard_map module
    restriction), and matches the fft path numerically."""
    from cmgan_tpu.config import DSPConfig
    from cmgan_tpu.streaming import _window_fn

    cfg, variables = tiny
    cfg_mm = dataclasses.replace(cfg, dsp=DSPConfig(dft_impl="matmul"))

    rng = np.random.default_rng(11)
    windows = jnp.asarray(
        rng.standard_normal((1, 9000)).astype(np.float32) * 0.1
    )
    c = jnp.ones((1,), np.float32)

    fn_mm = _window_fn(cfg_mm, None)
    hlo = fn_mm.lower(variables, windows, c).as_text()
    assert "fft" not in hlo.lower()

    out_mm = np.asarray(fn_mm(variables, windows, c))
    out_fft = np.asarray(_window_fn(cfg, None)(variables, windows, c))
    np.testing.assert_allclose(out_mm, out_fft, atol=1e-4, rtol=1e-4)
