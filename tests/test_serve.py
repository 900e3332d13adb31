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


def test_protocol_rejects_hostile_headers():
    """A 4-byte header must not be able to demand a huge allocation or
    a non-float32-aligned payload (round-2 advisor finding)."""
    import socket
    import struct
    import threading

    from cmgan_tpu.cli.serve import MAX_FRAME_BYTES, ProtocolError, recv_frame

    def run_case(header_n, payload=b""):
        a, b = socket.socketpair()
        try:
            a.sendall(struct.pack("<I", header_n) + payload)
            a.shutdown(socket.SHUT_WR)
            return recv_frame(b)
        finally:
            a.close()
            b.close()

    import pytest

    with pytest.raises(ProtocolError):
        run_case(MAX_FRAME_BYTES + 4)
    with pytest.raises(ProtocolError):
        run_case(6, b"abcdef")  # not a multiple of 4
    assert run_case(0) == b""
    assert run_case(8, b"12345678") == b"12345678"


# ---------------------------------------------------------------------------
# Batched serving (--slots): BatcherWorker multiplexing


@pytest.fixture(scope="module")
def served_batched(served):
    cfg, variables, kw, _ = served
    server = make_server(cfg, variables, port=0, slots=3, **kw)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield cfg, variables, kw, server.server_address
    server.shutdown()
    server.server_close()


def test_batched_server_matches_direct(served_batched):
    """One connection through the slot-multiplexed server equals the
    direct engine (same chunk schedule, WOLA default)."""
    cfg, variables, kw, addr = served_batched
    rng = np.random.default_rng(7)
    track = (rng.standard_normal(9500) * 0.1).astype(np.float32)

    via_server = enhance_via_server(addr, track, block=1700, timeout=120)

    direct_enh = StreamingEnhancer(cfg, variables, **kw)
    direct = np.concatenate([direct_enh.push(track), direct_enh.flush()])[
        : track.size
    ]
    assert via_server.shape == direct.shape == track.shape
    np.testing.assert_allclose(via_server, direct, atol=2e-5, rtol=1e-4)


def test_batched_server_concurrent_streams_match_direct(served_batched):
    """Three concurrent connections (== slot count) each reproduce
    their own solo-engine output: slot isolation holds under real
    concurrency and asynchronous arrival."""
    cfg, variables, kw, addr = served_batched
    rng = np.random.default_rng(8)
    tracks = {
        name: (rng.standard_normal(n) * amp).astype(np.float32)
        for name, n, amp in
        [("a", 9500, 0.1), ("b", 6200, 0.05), ("c", 12000, 0.2)]
    }

    results = {}

    def run(name):
        results[name] = enhance_via_server(
            addr, tracks[name], block=1300, timeout=120
        )

    threads = [threading.Thread(target=run, args=(n,)) for n in tracks]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)

    for name, track in tracks.items():
        e = StreamingEnhancer(cfg, variables, **kw)
        ref = np.concatenate([e.push(track), e.flush()])[: track.size]
        assert results[name].shape == track.shape
        np.testing.assert_allclose(
            results[name], ref, atol=2e-5, rtol=1e-4, err_msg=name
        )


def test_batched_server_slot_reuse_across_serial_connections(served_batched):
    """More serial connections than slots: slots recycle cleanly."""
    cfg, variables, kw, addr = served_batched
    rng = np.random.default_rng(9)
    for i in range(5):  # > 3 slots, sequentially
        track = (rng.standard_normal(4200) * 0.1).astype(np.float32)
        out = enhance_via_server(addr, track, block=2100, timeout=120)
        e = StreamingEnhancer(cfg, variables, **kw)
        ref = np.concatenate([e.push(track), e.flush()])[: track.size]
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Round-3 advisor findings: worker crash recovery, backpressure, abort frames


def test_batched_worker_survives_step_failure(served):
    """An exception in the shared tick thread must abort in-flight
    sessions as TRUNCATED streams (EOF with no b'' completion frame)
    and keep serving later connections — not silently kill the tick
    thread and hang every batched connection forever."""
    import socket as socket_mod

    from cmgan_tpu.cli.serve import recv_frame, send_frame

    cfg, variables, kw, _ = served
    server = make_server(cfg, variables, port=0, slots=2, **kw)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        worker = server.worker
        orig = worker.batcher.step
        armed = {"on": True}

        def boom(blocks):
            if armed["on"]:
                armed["on"] = False
                raise RuntimeError("injected device failure")
            return orig(blocks)

        worker.batcher.step = boom

        rng = np.random.default_rng(3)
        track = (rng.standard_normal(4000) * 0.1).astype(np.float32)
        with socket_mod.create_connection(server.server_address) as sock:
            sock.settimeout(60)
            send_frame(sock, track.astype("<f4").tobytes())  # 2 chunks
            frames = []
            while True:
                f = recv_frame(sock)
                if f is None:
                    break
                frames.append(f)
        # server-side abort: no clean-completion frame may be sent
        assert b"" not in frames
        assert worker.thread.is_alive()

        # the worker keeps ticking: a fresh connection works end to end
        out = enhance_via_server(
            server.server_address, track, block=1300, timeout=120
        )
        e = StreamingEnhancer(cfg, variables, **kw)
        ref = np.concatenate([e.push(track), e.flush()])[: track.size]
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
    finally:
        server.shutdown()
        server.server_close()


def test_feed_backpressure_bounds_pending(served, monkeypatch):
    """A client uploading much faster than the tick rate must not grow
    unbounded host buffers: feed() blocks at MAX_PENDING_SAMPLES (TCP
    backpressure) and the stream still completes exactly."""
    import time

    from cmgan_tpu.cli import serve as serve_mod
    from cmgan_tpu.cli.serve import _DONE, BatcherWorker

    cfg, variables, kw, _ = served
    chunk = kw["chunk"]
    cap = 3 * chunk
    monkeypatch.setattr(serve_mod, "MAX_PENDING_SAMPLES", cap)
    worker = BatcherWorker(cfg, variables, num_slots=1, emit="wola", **kw)
    try:
        orig = worker.batcher.step

        def slow(blocks):
            time.sleep(0.05)  # make the upload outrun the tick rate
            return orig(blocks)

        worker.batcher.step = slow
        sess = worker.open_session()
        rng = np.random.default_rng(4)
        track = (rng.standard_normal(20 * chunk) * 0.1).astype(np.float32)

        def feeder():
            for lo in range(0, track.size, chunk):
                sess.feed(track[lo : lo + chunk])
            sess.finish()

        t = threading.Thread(target=feeder, daemon=True)
        t.start()
        outs, max_pending = [], 0
        while True:
            item = sess.out_q.get(timeout=120)
            if item is _DONE:
                break
            outs.append(item)
            with worker.cond:
                max_pending = max(max_pending, sess.pending.size)
        t.join(30)
        assert not t.is_alive()
        assert max_pending <= cap

        est = np.concatenate(outs)
        assert est.size == track.size
        e = StreamingEnhancer(cfg, variables, **kw)
        ref = np.concatenate([e.push(track), e.flush()])[: track.size]
        np.testing.assert_allclose(est, ref, atol=2e-5, rtol=1e-4)
    finally:
        worker.shutdown()
