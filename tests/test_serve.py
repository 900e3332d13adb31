"""Streaming TCP server (cli/serve.py): framed protocol round-trip."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmgan_tpu.cli.serve import enhance_via_server, make_server
from cmgan_tpu.config import CMGANConfig, ModelConfig
from cmgan_tpu.models import TSCNet
from cmgan_tpu.streaming import StreamingEnhancer


@pytest.fixture(scope="module")
def served():
    cfg = CMGANConfig(
        model=ModelConfig(
            num_channels=16, num_tscb_blocks=1, dense_depth=2, attn_heads=2
        )
    )
    model = TSCNet(cfg.model)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 21, 201, 2))
    )
    kw = dict(chunk=2000, left_context=4000, lookahead=1000)
    server = make_server(cfg, variables, port=0, **kw)  # ephemeral port
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield cfg, variables, kw, server.server_address
    server.shutdown()
    server.server_close()


def test_served_stream_matches_direct(served):
    """Streaming through the server must equal calling the engine
    directly — the protocol adds no resampling/reordering/loss."""
    cfg, variables, kw, addr = served
    rng = np.random.default_rng(0)
    track = (rng.standard_normal(9500) * 0.1).astype(np.float32)

    via_server = enhance_via_server(addr, track, block=1700)

    direct_enh = StreamingEnhancer(cfg, variables, **kw)
    parts = [direct_enh.push(track)]
    parts.append(direct_enh.flush())
    direct = np.concatenate(parts)[: track.size]

    assert via_server.shape == direct.shape == track.shape
    np.testing.assert_allclose(via_server, direct, atol=1e-6)


def test_two_concurrent_streams_are_independent(served):
    """Two connections must each get their own stream state."""
    cfg, variables, kw, addr = served
    rng = np.random.default_rng(1)
    a = (rng.standard_normal(6000) * 0.1).astype(np.float32)
    b = (rng.standard_normal(6000) * 0.05).astype(np.float32)

    results = {}

    def run(name, track):
        results[name] = enhance_via_server(addr, track, block=1300)

    ta = threading.Thread(target=run, args=("a", a))
    tb = threading.Thread(target=run, args=("b", b))
    ta.start(); tb.start(); ta.join(60); tb.join(60)

    ref_a = np.concatenate(
        [(e := StreamingEnhancer(cfg, variables, **kw)).push(a), e.flush()]
    )[: a.size]
    np.testing.assert_allclose(results["a"], ref_a, atol=1e-6)
    assert results["b"].shape == b.shape
    assert not np.allclose(results["a"], results["b"])
