"""Measure the DSP front/back-end's share of pipeline time on TPU.

The round-1 north star names fused Pallas kernels for the STFT
front-end (framing + rFFT + power compression) and the iSTFT
overlap-add (reference hot path: src/train.py:81-94,106-112). Before
building them, this script measures what XLA's fusion already achieves:
it times, at the bench shape (batch 16, 2 s, bf16 model),

  a) the full enhance pipeline (STFT -> TSCNet -> iSTFT),
  b) the model body alone on a precomputed spectrum,
  c) the DSP halves alone (stft+compress, uncompress+istft),

and reports the DSP share of (a). If the share is below ~5%, a Pallas
kernel cannot move the headline number and the item closes by
evidence; otherwise it bounds the attainable speedup.

Usage: python tools/profile_dsp_share.py [--batch 16] [--fp32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=30):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # force fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=int, default=2)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cmgan_tpu.config import CMGANConfig
    from cmgan_tpu.dsp import istft, power_compress, power_uncompress, stft
    from cmgan_tpu.models import TSCNet

    cfg = CMGANConfig()
    dsp = cfg.dsp
    seg_len = dsp.sample_rate * args.seconds
    dtype = None if args.fp32 else jnp.bfloat16

    model = TSCNet(cfg.model, dtype=dtype)
    frames = dsp.num_frames(seg_len)
    spec0 = jnp.zeros((1, frames, dsp.num_freqs, 2), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, spec0)

    @jax.jit
    def full(variables, segments):
        spec = power_compress(stft(segments, dsp.n_fft, dsp.hop),
                              exponent=dsp.compress_exponent)
        er, ei = model.apply(variables, spec, train=False)
        est = power_uncompress(er.astype(jnp.float32), ei.astype(jnp.float32),
                               exponent=dsp.compress_exponent)
        return istft(est, dsp.n_fft, dsp.hop)

    @jax.jit
    def model_only(variables, spec):
        return model.apply(variables, spec, train=False)

    @jax.jit
    def front(segments):
        return power_compress(stft(segments, dsp.n_fft, dsp.hop),
                              exponent=dsp.compress_exponent)

    @jax.jit
    def back(er, ei):
        est = power_uncompress(er, ei, exponent=dsp.compress_exponent)
        return istft(est, dsp.n_fft, dsp.hop)

    rng = np.random.default_rng(0)
    segments = jnp.asarray(
        rng.standard_normal((args.batch, seg_len)).astype(np.float32) * 0.1)
    spec = front(segments)
    er = spec[..., 0].astype(jnp.float32)
    ei = spec[..., 1].astype(jnp.float32)

    t_full = timeit(full, variables, segments)
    t_model = timeit(model_only, variables, spec)
    t_front = timeit(front, segments)
    t_back = timeit(back, er, ei)

    dsp_t = t_front + t_back
    print(json.dumps({
        "batch": args.batch,
        "dtype": "fp32" if args.fp32 else "bf16",
        "full_ms": round(t_full * 1e3, 3),
        "model_ms": round(t_model * 1e3, 3),
        "stft_front_ms": round(t_front * 1e3, 3),
        "istft_back_ms": round(t_back * 1e3, 3),
        "dsp_share_of_full": round(dsp_t / t_full, 4),
        "max_speedup_if_dsp_free": round(t_full / (t_full - dsp_t), 4),
    }))


if __name__ == "__main__":
    main()
