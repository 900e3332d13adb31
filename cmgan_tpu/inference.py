"""End-to-end enhancement: wav -> STFT -> TSCNet -> iSTFT -> wav.

The whole per-batch pipeline (normalization undo included) is ONE jitted
XLA graph — framing, rFFT, compression, the generator, uncompression and
overlap-add fuse into a single device program, unlike the reference
which round-trips through five torch calls (src/evaluation.py:36-50).

Track chunking reproduces the reference semantics
(src/evaluation.py:21-34): RMS-normalize from the noisy track, wrap-pad
to a hop multiple, and for tracks longer than `cut_len` fold into a
batch whose size divides the hop so every segment stays hop-aligned.

Two length-handling modes:
- exact:   segment shapes are used as-is (bit-faithful to the reference,
           recompiles per distinct track length — fine on CPU, costly on TPU).
- bucket:  wrap-padding continues to the next bucket boundary so the 824
           variable-length test tracks hit a handful of compiled shapes.
           Not bit-identical (the conformer attends over the extra tail
           frames) but metric-neutral; default for TPU throughput.
           Measured on the round-2 TRAINED checkpoint over the held-out
           tracks (QUALITY_r02.md): bucket vs exact is -0.0045 PESQ /
           -0.011 dB SSNR / -0.003 CSIG — well under run-to-run noise.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cmgan_tpu.config import CMGANConfig
from cmgan_tpu.dsp import istft, power_compress, power_uncompress, stft
from cmgan_tpu.models import TSCNet


def segment_track(noisy: np.ndarray, hop: int, cut_len: int) -> Tuple[np.ndarray, int]:
    """Wrap-pad to a hop multiple and fold long tracks into a batch.

    noisy: [n] normalized track. Returns (segments [B, L], padded_len).
    Reference: src/evaluation.py:25-34 — with one correction: when the
    folded segment length is not itself a hop multiple, the reference's
    iSTFT drops `seg % hop` samples per segment and its output-length
    assert fails (latent — VCTK-DEMAND test tracks are all shorter than
    cut_len, so folding never triggers there). Here the wrap padding is
    extended so segments are hop-aligned; identical to the reference
    wherever the reference works.
    """
    length = noisy.shape[-1]
    padded_len = int(math.ceil(length / hop)) * hop
    if padded_len > cut_len:
        batch_size = int(math.ceil(padded_len / cut_len))
        while hop % batch_size != 0:
            batch_size += 1
        # hop-align the per-segment length (see docstring)
        seg_quantum = batch_size * hop
        padded_len = int(math.ceil(padded_len / seg_quantum)) * seg_quantum
    else:
        batch_size = 1
    reps = int(math.ceil(padded_len / length)) if padded_len > length else 1
    x = np.concatenate([noisy] * reps + [noisy[: max(padded_len - reps * length, 0)]])[
        :padded_len
    ]
    return x.reshape(batch_size, -1), padded_len


def bucket_pad(noisy: np.ndarray, hop: int, cut_len: int, bucket: int) -> np.ndarray:
    """Tile-extend a track so its padded length lands on a bucket boundary."""
    length = noisy.shape[-1]
    target = int(math.ceil(length / bucket)) * bucket
    reps = int(math.ceil(target / length))
    return np.tile(noisy, reps)[:target]


class Enhancer:
    """Stateful wrapper holding jitted per-shape enhancement executables.

    mesh: optional device mesh made ambient around every jitted call.
    Batch rows are sharded over the mesh's `data` axis (SPMD multi-chip
    batch inference; rows padded to the axis size with exact duplicate
    rows). Required when cfg.model.attention_impl == 'seq' (long-form
    time-axis sharding over the `seq` axis, BASELINE config 5).
    """

    def __init__(self, cfg: CMGANConfig, variables, dtype=None, mesh=None):
        self.cfg = cfg
        self.variables = variables
        self.model = TSCNet(cfg.model, dtype=dtype)
        self.mesh = mesh

        dsp = cfg.dsp

        @jax.jit
        def _jit_enhance_batch(variables, segments):
            # segments: [B, L] already RMS-normalized
            spec = stft(segments, dsp.n_fft, dsp.hop)
            packed = power_compress(spec, exponent=dsp.compress_exponent)
            est_real, est_imag = self.model.apply(variables, packed, train=False)
            est_spec = power_uncompress(
                est_real, est_imag, exponent=dsp.compress_exponent
            )
            return istft(est_spec, dsp.n_fft, dsp.hop)

        @jax.jit
        def _jit_front(segments):
            return power_compress(
                stft(segments, dsp.n_fft, dsp.hop),
                exponent=dsp.compress_exponent,
            )

        @jax.jit
        def _jit_model(variables, packed):
            return self.model.apply(variables, packed, train=False)

        @jax.jit
        def _jit_back(est_real, est_imag):
            return istft(
                power_uncompress(
                    est_real, est_imag, exponent=dsp.compress_exponent
                ),
                dsp.n_fft,
                dsp.hop,
            )

        def _enhance_batch(variables, segments):
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                # shard the row (batch) axis over `data` so multi-chip
                # batch inference is SPMD, not replicated — pad rows to
                # a multiple of the axis size (duplicate rows are exact
                # in eval mode, see enhance_batch) and drop them after
                n_data = dict(self.mesh.shape).get("data", 1)
                pad = (-int(segments.shape[0])) % n_data
                if pad:
                    segments = jnp.concatenate(
                        [segments, jnp.broadcast_to(
                            segments[:1], (pad,) + segments.shape[1:])]
                    )
                if n_data > 1:
                    segments = jax.device_put(
                        segments, NamedSharding(self.mesh, PartitionSpec("data"))
                    )
                # Under a mesh, the FFT stages compile OUTSIDE the mesh
                # context: the mesh only affects the model's seq-sharded
                # attention, and XLA:CPU's fft thunk rejects the layouts
                # it picks when rFFT and shard_map share one module.
                packed = _jit_front(segments)
                with jax.sharding.set_mesh(self.mesh):
                    est_real, est_imag = _jit_model(variables, packed)
                out = _jit_back(est_real, est_imag)
                return out[: out.shape[0] - pad] if pad else out
            return _jit_enhance_batch(variables, segments)

        self._enhance_batch = _enhance_batch

    def enhance_batch(
        self,
        tracks: list[np.ndarray],
        batch_cap: int = 16,
    ) -> list[np.ndarray]:
        """Enhance many tracks, batching same-bucket tracks together.

        In eval mode there is no cross-sample interaction (InstanceNorm
        is per-sample; BatchNorm uses running stats), so padding a
        batch with duplicate rows is exact. Tracks longer than cut_len
        fall back to the single-track segmented path.
        """
        dsp, ev = self.cfg.dsp, self.cfg.eval
        bucket = dsp.sample_rate
        tracks = [np.asarray(t, np.float32).reshape(-1) for t in tracks]
        results: list[np.ndarray | None] = [None] * len(tracks)
        groups: dict[int, list[int]] = {}
        for i, t in enumerate(tracks):
            padded = int(math.ceil(t.shape[-1] / bucket)) * bucket
            if padded > ev.cut_len:
                results[i] = self.enhance(t, mode="bucket")
            else:
                groups.setdefault(padded, []).append(i)

        # HBM budget: cap rows-per-batch inversely with bucket length so
        # activation footprint stays roughly constant (~2M samples/batch
        # fits comfortably alongside fp32 attention on a 16 GB chip).
        budget_samples = 2_000_000
        for padded, idxs in groups.items():
            cap = max(1, min(batch_cap, budget_samples // padded))
            for lo in range(0, len(idxs), cap):
                part = idxs[lo : lo + cap]
                rows, scales = [], []
                for i in part:
                    t = tracks[i]
                    c = math.sqrt(t.size / float(np.sum(t * t)))
                    rows.append(bucket_pad(t * c, dsp.hop, ev.cut_len, bucket))
                    scales.append(c)
                batch = np.stack(rows)
                if batch.shape[0] < cap:
                    pad_rows = np.broadcast_to(
                        batch[:1], (cap - batch.shape[0], padded)
                    )
                    batch = np.concatenate([batch, pad_rows])
                est = np.asarray(
                    self._enhance_batch(self.variables, jnp.asarray(batch))
                )
                for row, i, c in zip(est, part, scales):
                    n = tracks[i].shape[-1]
                    results[i] = (row[:n] / c).astype(np.float32)
        return results  # type: ignore[return-value]

    def enhance(self, noisy: np.ndarray, mode: str = "bucket") -> np.ndarray:
        """Enhance one track [n] -> [n] (float32).

        mode: 'exact' (reference-bit-faithful shapes) or 'bucket'.
        """
        noisy = np.asarray(noisy, np.float32).reshape(-1)
        length = noisy.shape[-1]
        dsp, ev = self.cfg.dsp, self.cfg.eval

        c = math.sqrt(length / float(np.sum(noisy * noisy)))
        x = noisy * c

        if mode == "bucket":
            bucket = dsp.sample_rate  # 1 s granularity -> <=16 shapes
            x = bucket_pad(x, dsp.hop, ev.cut_len, bucket)
        segments, _ = segment_track(x, dsp.hop, ev.cut_len)

        est = self._enhance_batch(self.variables, jnp.asarray(segments))
        est = np.asarray(est).reshape(-1)[:length] / c
        return est.astype(np.float32)
