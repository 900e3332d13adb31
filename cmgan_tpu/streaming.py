"""Streaming (chunked, low-latency) enhancement.

The reference has no streaming path — long tracks are chunked into an
on-device batch offline (src/evaluation.py:25-34). This module adds a
real-time capable path: a rolling analysis window slides over the
input; each step enhances [left_context | chunk | lookahead] through
the same jitted STFT->TSCNet->iSTFT graph (ONE compiled shape) and
emits the chunk region, cross-faded with the previous emission over
`crossfade` samples to hide seams.

Algorithmic latency = chunk + lookahead (+ compute). The TSCNet time
attention and dilated convs see `left_context` seconds of past
context. Measured on the round-3 trained checkpoint (QUALITY_r03.md
S5, `tools/streaming_eval.py`): 1 s context / 0.25 s lookahead /
0.5 s chunk scores held-out PESQ 3.073 (wola emission; 3.066 with
crossfade) vs 3.211 offline — the remaining gap is the per-window
noise-profile re-estimation, not context starvation or causal
normalization (both ruled out by the diagnostics recorded there).

Level normalization uses a running RMS of the input (the offline
whole-track RMS is unavailable causally), inverted on emission.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cmgan_tpu.config import CMGANConfig
from cmgan_tpu.dsp import istft, power_compress, power_uncompress, stft
from cmgan_tpu.models import TSCNet

# One jitted window program per (model config, dsp config, dtype),
# shared across ALL StreamingEnhancer instances: a per-instance closure
# would re-trace (and on a cold persistent cache, re-compile — minutes
# through the TPU remote-compile tunnel) for every new instance, e.g.
# per TCP connection in cli/serve.py (round-2 advisor finding).
_SHARED_WINDOW_FNS: dict = {}


def _window_fn(cfg: CMGANConfig, dtype):
    key = (cfg.model, cfg.dsp, dtype)
    fn = _SHARED_WINDOW_FNS.get(key)
    if fn is None:
        dsp = cfg.dsp
        model = TSCNet(cfg.model, dtype=dtype)

        @jax.jit
        def fn(variables, windows, c):
            # windows: [S, window], c: [S] per-stream level scales
            x = windows * c[:, None]
            # dft_impl threaded through like train/steps.py: a config
            # trained with dft_impl='matmul' (e.g. long_form_48k with
            # seq_parallel > 1) must stream through the numerically
            # identical DFT, and CPU seq-sharded inference cannot mix
            # the fft thunk with shard_map in one module.
            spec = stft(x, dsp.n_fft, dsp.hop, dft_impl=dsp.dft_impl)
            packed = power_compress(spec, exponent=dsp.compress_exponent)
            est_real, est_imag = model.apply(variables, packed, train=False)
            est = power_uncompress(
                est_real.astype(jnp.float32),
                est_imag.astype(jnp.float32),
                exponent=dsp.compress_exponent,
            )
            return istft(est, dsp.n_fft, dsp.hop, dft_impl=dsp.dft_impl) / c[:, None]

        _SHARED_WINDOW_FNS[key] = fn
    return fn


class StreamingEnhancer:
    """Push-based streaming enhancer with fixed compute shape.

    Usage:
        s = StreamingEnhancer(cfg, variables)
        for block in audio_blocks:              # arbitrary block sizes
            out.append(s.push(block))
        out.append(s.flush())

    `num_streams > 1` runs that many independent streams in lockstep as
    one device batch (server-style batching): push/flush then take and
    return `[num_streams, n]` blocks. Per-stream state (normalization,
    crossfade tails) stays independent; one chip serves an order of
    magnitude more concurrent streams than stepping them one by one.

    `emit` selects seam handling:
      - "wola" (default): weighted overlap-add over window estimates.
        Each window also estimates the `lookahead` samples BEYOND the
        emitted chunk; instead of discarding them, they are blended
        with the next windows' estimates under a weight profile that
        ramps 0->1 over the first min(chunk, lookahead) samples and
        mirrors down over the last — adjacent windows' weights sum to
        1, so every emitted sample is a smooth mixture of up to
        1 + ceil(lookahead/chunk) independent estimates. Zero extra
        compute, zero extra latency (the tail estimates are already
        produced and would arrive earlier than emission time).
      - "crossfade": round-2 behavior; single-window emission with a
        `crossfade`-sample linear seam blend.
    """

    def __init__(
        self,
        cfg: CMGANConfig,
        variables,
        chunk: int = 8000,           # 0.5 s emission granularity
        left_context: int = 24000,   # 1.5 s past context
        lookahead: int = 4000,       # 0.25 s future context
        crossfade: int = 400,        # 25 ms seam blending
        dtype=None,
        rms_decay: float = 0.95,
        num_streams: int = 1,
        emit: str = "wola",
    ):
        dsp = cfg.dsp
        assert chunk % dsp.hop == 0 and left_context % dsp.hop == 0
        assert lookahead % dsp.hop == 0 and 0 <= crossfade <= chunk
        assert num_streams >= 1
        assert emit in ("wola", "crossfade")
        if emit == "wola" and lookahead == 0:
            emit = "crossfade"  # no tail estimates to blend
        self.cfg = cfg
        self.chunk = chunk
        self.left_context = left_context
        self.lookahead = lookahead
        self.crossfade = crossfade
        self.window = left_context + chunk + lookahead
        self.rms_decay = rms_decay
        self.num_streams = num_streams
        self.emit = emit

        self.model = TSCNet(cfg.model, dtype=dtype)
        self.variables = variables
        self._enhance_window = _window_fn(cfg, dtype)
        if emit == "wola":
            ramp = min(chunk, lookahead)
            length = chunk + lookahead
            w = np.ones(length, np.float32)
            # raised-cosine half-ramps; rise(o) + fall(o) == 1 so the
            # total weight across overlapping windows is continuous
            t = (np.arange(ramp, dtype=np.float32) + 0.5) / ramp
            rise = 0.5 - 0.5 * np.cos(np.pi * t)
            w[:ramp] = rise
            w[length - ramp :] = rise[::-1]
            self._wola_w = w
        self.reset()

    def reset(self):
        s = self.num_streams
        self._in_buffer = np.zeros((s, self.window), np.float32)
        self._pending = np.zeros((s, 0), np.float32)
        self._prev_tail: Optional[np.ndarray] = None
        self._mean_sq = np.zeros(s)
        self._warm = False
        if self.emit == "wola":
            length = self.chunk + self.lookahead
            self._acc = np.zeros((s, length), np.float32)
            self._wacc = np.zeros((s, length), np.float32)
        # the first `lookahead` raw emitted samples precede stream index
        # 0 (zero padding); drop them so output index i == input index i
        self._skip = self.lookahead

    @property
    def latency_samples(self) -> int:
        """Algorithmic latency (excl. compute): chunk + lookahead."""
        return self.chunk + self.lookahead

    def _step(self, new_chunk: np.ndarray) -> np.ndarray:
        """Consume exactly [S, chunk] new samples, return [S, chunk]
        enhanced samples (delayed by `lookahead`)."""
        # slide the analysis window
        self._in_buffer = np.concatenate(
            [self._in_buffer[:, self.chunk :], new_chunk], axis=1
        )
        # running RMS from observed input (causal analog of the offline
        # whole-track normalization, reference src/evaluation.py:21-23)
        block_ms = np.mean(new_chunk**2, axis=1)
        if not self._warm:
            self._mean_sq = np.maximum(block_ms, 1e-8)
            self._warm = True
        else:
            self._mean_sq = (
                self.rms_decay * self._mean_sq + (1 - self.rms_decay) * block_ms
            )
        c = (1.0 / np.sqrt(np.maximum(self._mean_sq, 1e-8))).astype(np.float32)

        est = np.asarray(
            self._enhance_window(
                self.variables, jnp.asarray(self._in_buffer), jnp.asarray(c)
            )
        )
        # emission region: the chunk that now sits `lookahead` from the end
        start = self.window - self.lookahead - self.chunk

        if self.emit == "wola":
            region = est[:, start:]  # [S, chunk + lookahead]
            self._acc += self._wola_w * region
            self._wacc += self._wola_w
            num = self._acc[:, : self.chunk]
            den = self._wacc[:, : self.chunk]
            # den < 1 only in the first ramp of a fresh stream (no
            # predecessor window yet): fall back to the raw estimate
            out = np.where(
                den > 1e-3, num / np.maximum(den, 1e-3), region[:, : self.chunk]
            ).astype(np.float32)
            shift = self.chunk
            self._acc = np.concatenate(
                [self._acc[:, shift:], np.zeros((est.shape[0], shift), np.float32)],
                axis=1,
            )
            self._wacc = np.concatenate(
                [self._wacc[:, shift:], np.zeros((est.shape[0], shift), np.float32)],
                axis=1,
            )
            return out

        out = est[:, start : start + self.chunk].copy()
        if self.crossfade > 0:
            fade = np.linspace(0.0, 1.0, self.crossfade, dtype=np.float32)
            if self._prev_tail is not None:
                out[:, : self.crossfade] = (
                    fade * out[:, : self.crossfade]
                    + (1.0 - fade) * self._prev_tail
                )
            # stash this step's estimate of the NEXT chunk's head
            nxt = est[:, start + self.chunk : start + self.chunk + self.crossfade]
            self._prev_tail = (
                nxt.copy() if nxt.shape[1] == self.crossfade else None
            )
        return out

    def _emit(self, raw: np.ndarray) -> np.ndarray:
        if self._skip > 0:
            cut = min(self._skip, raw.shape[1])
            self._skip -= cut
            raw = raw[:, cut:]
        return raw

    def _coerce(self, samples: np.ndarray) -> np.ndarray:
        x = np.asarray(samples, np.float32)
        if self.num_streams == 1 and x.ndim == 1:
            x = x[None, :]
        assert x.ndim == 2 and x.shape[0] == self.num_streams
        return x

    def _deliver(self, out: np.ndarray) -> np.ndarray:
        return out[0] if self.num_streams == 1 else out

    def push(self, samples: np.ndarray) -> np.ndarray:
        """Feed audio ([n] for one stream, [S, n] for S streams);
        returns whatever output is ready (same leading shape).

        Output sample i is the enhanced input sample i (the stream runs
        `latency_samples` behind the input in wall-clock terms).
        """
        self._pending = np.concatenate(
            [self._pending, self._coerce(samples)], axis=1
        )
        outs = []
        while self._pending.shape[1] >= self.chunk:
            outs.append(self._emit(self._step(self._pending[:, : self.chunk])))
            self._pending = self._pending[:, self.chunk :]
        out = (
            np.concatenate(outs, axis=1)
            if outs
            else np.zeros((self.num_streams, 0), np.float32)
        )
        return self._deliver(out)

    def flush(self) -> np.ndarray:
        """Emit the remainder (pads the stream tail with zeros)."""
        remainder = self._pending.shape[1]
        outs = []
        if remainder:
            pad = np.zeros((self.num_streams, self.chunk - remainder), np.float32)
            outs.append(
                self._emit(self._step(np.concatenate([self._pending, pad], axis=1)))
            )
        # push zeros to recover the lookahead-delayed tail
        tail_steps = -(-self.lookahead // self.chunk) + 1
        for _ in range(tail_steps):
            outs.append(
                self._emit(self._step(np.zeros((self.num_streams, self.chunk), np.float32)))
            )
        self._pending = np.zeros((self.num_streams, 0), np.float32)
        out = (
            np.concatenate(outs, axis=1)
            if outs
            else np.zeros((self.num_streams, 0), np.float32)
        )
        # aligned samples still owed: the remainder plus the lookahead-
        # delayed tail of the already-pushed chunks
        return self._deliver(out[:, : remainder + self.lookahead])

    def enhance_stream(
        self, blocks: Iterator[np.ndarray]
    ) -> Iterator[np.ndarray]:
        for block in blocks:
            out = self.push(block)
            if out.size:
                yield out
        tail = self.flush()
        if tail.size:
            yield tail


class StreamBatcher:
    """Slot-based batched streaming engine for serving.

    `StreamingEnhancer(num_streams=S)` batches S streams that advance in
    LOCKSTEP — fine for offline batch jobs, wrong for a server whose
    connections start, stall and end independently. StreamBatcher keeps
    S independent slots behind ONE fixed-shape jitted window program
    (the TPU-native shape discipline: never re-trace for concurrency;
    idle slots ride along as wasted lanes, masked out on the host):

        slot = b.open()                 # claim a slot (resets its state)
        out = b.step({slot: chunk})     # tick any subset of slots
        b.close(slot)                   # release

    Each `step` call consumes exactly `chunk` samples for every slot in
    the dict and returns the aligned enhanced samples per slot (empty
    rows while the slot's initial `lookahead` alignment skip drains).
    Slots NOT in the dict keep their analysis state frozen — their lane
    still flows through the device batch but the result is discarded,
    so a slot's output depends only on its own chunk sequence (pinned
    by tests against a solo StreamingEnhancer).

    End-of-stream is caller accounting (see cli/serve.py): pad the
    final partial chunk with zeros, feed ceil(lookahead/chunk)+1 zero
    chunks to drain the lookahead delay, and trim the delivered total
    to the real input length.
    """

    def __init__(
        self,
        cfg: CMGANConfig,
        variables,
        num_slots: int = 8,
        chunk: int = 8000,
        left_context: int = 24000,
        lookahead: int = 4000,
        crossfade: int = 400,
        dtype=None,
        rms_decay: float = 0.95,
        emit: str = "wola",
    ):
        dsp = cfg.dsp
        assert chunk % dsp.hop == 0 and left_context % dsp.hop == 0
        assert lookahead % dsp.hop == 0 and 0 <= crossfade <= chunk
        assert num_slots >= 1
        assert emit in ("wola", "crossfade")
        if emit == "wola" and lookahead == 0:
            emit = "crossfade"
        self.cfg = cfg
        self.chunk = chunk
        self.left_context = left_context
        self.lookahead = lookahead
        self.crossfade = crossfade
        self.window = left_context + chunk + lookahead
        self.rms_decay = rms_decay
        self.num_slots = num_slots
        self.emit = emit
        self.variables = variables
        self._enhance_window = _window_fn(cfg, dtype)
        if emit == "wola":
            ramp = min(chunk, lookahead)
            length = chunk + lookahead
            w = np.ones(length, np.float32)
            t = (np.arange(ramp, dtype=np.float32) + 0.5) / ramp
            rise = 0.5 - 0.5 * np.cos(np.pi * t)
            w[:ramp] = rise
            w[length - ramp :] = rise[::-1]
            self._wola_w = w

        s = num_slots
        self._free = list(range(s))
        self._in_buffer = np.zeros((s, self.window), np.float32)
        self._mean_sq = np.zeros(s)
        self._warm = np.zeros(s, bool)
        self._skip = np.zeros(s, np.int64)
        if emit == "wola":
            length = chunk + lookahead
            self._acc = np.zeros((s, length), np.float32)
            self._wacc = np.zeros((s, length), np.float32)
        self._prev_tail = np.zeros((s, crossfade), np.float32)
        self._has_tail = np.zeros(s, bool)

    @property
    def latency_samples(self) -> int:
        return self.chunk + self.lookahead

    def open(self) -> int:
        """Claim a free slot and reset its per-stream state."""
        if not self._free:
            raise RuntimeError(f"all {self.num_slots} slots in use")
        i = self._free.pop(0)
        self._in_buffer[i] = 0.0
        self._mean_sq[i] = 0.0
        self._warm[i] = False
        self._skip[i] = self.lookahead
        if self.emit == "wola":
            self._acc[i] = 0.0
            self._wacc[i] = 0.0
        self._prev_tail[i] = 0.0
        self._has_tail[i] = False
        return i

    def close(self, slot: int):
        assert slot not in self._free
        self._free.append(slot)

    def step(self, blocks: dict) -> dict:
        """Tick: {slot: [chunk] float32} -> {slot: aligned output}.

        Every value must be exactly `chunk` samples. Returns per-slot
        aligned enhanced samples (may be shorter than `chunk` — or empty
        — while the slot's initial alignment skip drains).
        """
        if not blocks:
            return {}
        act = np.asarray(sorted(blocks), np.int64)
        new = np.stack([np.asarray(blocks[i], np.float32) for i in act])
        assert new.shape == (act.size, self.chunk)

        # slide active rows' analysis windows
        self._in_buffer[act] = np.concatenate(
            [self._in_buffer[act, self.chunk :], new], axis=1
        )
        block_ms = np.mean(new**2, axis=1)
        cold = ~self._warm[act]
        upd = np.where(
            cold,
            np.maximum(block_ms, 1e-8),
            self.rms_decay * self._mean_sq[act]
            + (1 - self.rms_decay) * block_ms,
        )
        self._mean_sq[act] = upd
        self._warm[act] = True

        c = (1.0 / np.sqrt(np.maximum(self._mean_sq, 1e-8))).astype(np.float32)
        est = np.asarray(
            self._enhance_window(
                self.variables, jnp.asarray(self._in_buffer), jnp.asarray(c)
            )
        )
        start = self.window - self.lookahead - self.chunk

        if self.emit == "wola":
            region = est[act, start:]
            self._acc[act] += self._wola_w * region
            self._wacc[act] += self._wola_w
            num = self._acc[act, : self.chunk]
            den = self._wacc[act, : self.chunk]
            out = np.where(
                den > 1e-3, num / np.maximum(den, 1e-3), region[:, : self.chunk]
            ).astype(np.float32)
            shift = self.chunk
            self._acc[act] = np.concatenate(
                [self._acc[act, shift:],
                 np.zeros((act.size, shift), np.float32)], axis=1,
            )
            self._wacc[act] = np.concatenate(
                [self._wacc[act, shift:],
                 np.zeros((act.size, shift), np.float32)], axis=1,
            )
        else:
            out = est[act, start : start + self.chunk].copy()
            if self.crossfade > 0:
                fade = np.linspace(0.0, 1.0, self.crossfade, dtype=np.float32)
                tails = self._prev_tail[act]
                blend = (
                    fade * out[:, : self.crossfade] + (1.0 - fade) * tails
                )
                out[:, : self.crossfade] = np.where(
                    self._has_tail[act][:, None],
                    blend,
                    out[:, : self.crossfade],
                )
                nxt = est[
                    act, start + self.chunk : start + self.chunk + self.crossfade
                ]
                if nxt.shape[1] == self.crossfade:
                    self._prev_tail[act] = nxt
                    self._has_tail[act] = True
                else:
                    self._has_tail[act] = False

        result = {}
        for row, i in enumerate(act):
            cut = int(min(self._skip[i], self.chunk))
            self._skip[i] -= cut
            result[int(i)] = out[row, cut:]
        return result
