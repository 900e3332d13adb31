"""Streaming enhancement server — the serving surface of the stack.

The reference has no serving story (offline evaluation only,
src/evaluation.py); this exposes the low-latency streaming engine
(cmgan_tpu/streaming.py) over TCP so non-Python clients can stream
audio through a chip.

    python -m cmgan_tpu.cli.serve --port 7860 --model_path <ckpt>

Protocol (one connection = one audio stream, mono float32 @ 16 kHz):
  - every frame is <uint32 little-endian byte length> + payload
  - client sends raw float32 PCM blocks of any size
  - server replies with enhanced float32 PCM frames as output becomes
    ready (the stream runs `latency` samples behind the input)
  - a ZERO-LENGTH frame from the client flushes: the server emits the
    remaining tail, answers with a zero-length frame, and closes.

Each connection gets its own StreamingEnhancer (independent
normalization/crossfade state); all connections share one jitted
program, so the first connection pays the compile and the rest reuse
it. For very high stream density, batch lockstep streams in ONE
connection-side process via StreamingEnhancer(num_streams=N) instead.
"""

from __future__ import annotations

import argparse
import logging
import socket
import socketserver
import struct

import numpy as np

log = logging.getLogger("cmgan_tpu.serve")

_LEN = struct.Struct("<I")
# per-frame cap: 16 MiB = ~4 min of float32 @ 16 kHz per frame, far
# above any sane streaming block, far below a memory-exhaustion header
MAX_FRAME_BYTES = 16 << 20


class ProtocolError(ValueError):
    pass


def _recv_exact(sock, n: int) -> bytes | None:
    parts = []
    got = 0
    while got < n:
        part = sock.recv(n - got)
        if not part:
            return None
        parts.append(part)
        got += len(part)
    return b"".join(parts)


def recv_frame(sock) -> bytes | None:
    """None on EOF; b'' is a valid (flush/end) frame.

    Raises ProtocolError on a hostile/corrupt header: length over
    MAX_FRAME_BYTES (a 4-byte header can demand a ~4 GiB allocation) or
    not a whole number of float32 samples.
    """
    header = _recv_exact(sock, _LEN.size)
    if header is None:
        return None
    (n,) = _LEN.unpack(header)
    if n == 0:
        return b""
    if n > MAX_FRAME_BYTES:
        raise ProtocolError(f"frame of {n} bytes exceeds cap {MAX_FRAME_BYTES}")
    if n % 4:
        raise ProtocolError(f"frame length {n} is not a multiple of 4")
    return _recv_exact(sock, n)


def send_frame(sock, payload: bytes):
    sock.sendall(_LEN.pack(len(payload)) + payload)


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        from cmgan_tpu.streaming import StreamingEnhancer

        srv = self.server
        enh = StreamingEnhancer(
            srv.cfg,
            srv.variables,
            chunk=srv.stream_args["chunk"],
            left_context=srv.stream_args["left_context"],
            lookahead=srv.stream_args["lookahead"],
            emit=srv.stream_args["emit"],
        )
        log.info("stream from %s (latency %d samples)",
                 self.client_address, enh.latency_samples)
        while True:
            try:
                frame = recv_frame(self.request)
            except ProtocolError as exc:
                log.warning("dropping %s: %s", self.client_address, exc)
                return
            if frame is None:  # client vanished
                return
            if frame == b"":
                tail = enh.flush()  # 1-D: num_streams == 1 per connection
                if tail.size:
                    send_frame(self.request, tail.astype("<f4").tobytes())
                send_frame(self.request, b"")
                return
            block = np.frombuffer(frame, dtype="<f4").astype(np.float32)
            out = enh.push(block)
            if out.size:
                send_frame(self.request, out.astype("<f4").tobytes())


class StreamServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


def make_server(cfg, variables, host="127.0.0.1", port=7860,
                chunk=8000, left_context=24000, lookahead=4000,
                emit="wola"):
    server = StreamServer((host, port), _Handler)
    server.cfg = cfg
    server.variables = variables
    server.stream_args = {
        "chunk": chunk, "left_context": left_context, "lookahead": lookahead,
        "emit": emit,
    }
    return server


def enhance_via_server(addr, track: np.ndarray, block: int = 3000,
                       timeout: float = 600.0) -> np.ndarray:
    """Reference client: stream `track` through a server, return the
    enhanced track (aligned, same length). A reader thread drains
    server frames concurrently with the send loop, exactly as a
    real-time client would."""
    import threading

    track = np.asarray(track, np.float32).reshape(-1)
    out = []
    done = threading.Event()
    with socket.create_connection(addr) as sock:
        def reader():
            try:
                while True:
                    frame = recv_frame(sock)
                    if frame is None or frame == b"":
                        break
                    out.append(np.frombuffer(frame, dtype="<f4"))
            finally:
                done.set()

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        for lo in range(0, track.size, block):
            send_frame(sock, track[lo : lo + block].astype("<f4").tobytes())
        send_frame(sock, b"")
        if not done.wait(timeout):
            raise TimeoutError("server did not finish the stream in time")
    est = np.concatenate(out) if out else np.zeros(0, np.float32)
    return est[: track.size]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="CMGAN-TPU streaming server")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--model_path", type=str, default=None,
                   help="orbax checkpoint (inference variables or full "
                   "TrainState); random init if omitted")
    p.add_argument("--torch_ckpt", type=str, default=None)
    p.add_argument("--chunk", type=int, default=8000,
                   help="emission granularity in samples (0.5 s default)")
    p.add_argument("--left_context", type=int, default=24000)
    p.add_argument("--lookahead", type=int, default=4000)
    p.add_argument("--emit", type=str, default="wola",
                   choices=["wola", "crossfade"],
                   help="seam handling (see streaming.StreamingEnhancer)")
    # reuse the evaluate CLI's loader surface
    p.add_argument("--test_dir", help=argparse.SUPPRESS, default=None)
    return p.parse_args(argv)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)

    import os

    import jax

    # persistent compile cache (as bench.py/quality_run.py): a server
    # restart must not pay the multi-minute remote compile again
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache"),
    )

    from cmgan_tpu.cli.evaluate import load_variables
    from cmgan_tpu.config import CMGANConfig

    cfg = CMGANConfig()
    variables = load_variables(cfg, args)
    server = make_server(
        cfg, variables, host=args.host, port=args.port,
        chunk=args.chunk, left_context=args.left_context,
        lookahead=args.lookahead, emit=args.emit,
    )
    log.info("serving on %s:%d", args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
