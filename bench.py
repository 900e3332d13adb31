"""Benchmark: enhancement throughput per chip at 16 kHz.

Measures audio-seconds enhanced per wall-clock second through the full
jitted pipeline (STFT -> TSCNet -> iSTFT) on 2 s segments (the model's
native training context; offline eval chunks tracks the same way). The
north-star target is >=50x realtime per chip (BASELINE.json).

Also measures GAN TRAINING throughput on the reference hot loop
(src/train.py:176-205), batch 8 + TSCB remat, fp32, 2 s crops, in BOTH
label schedules: the fused device-label step (one XLA program,
`train_*` keys) and the reference-faithful synchronous host-label
schedule (`train_host_*` keys — the schedule the quality evidence
runs use). Env overrides: CMGAN_BENCH_TRAIN_BATCH / _DTYPE.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "train_steps_per_sec": N, "train_utt_per_sec": N,
   "train_host_steps_per_sec": N, "train_host_utt_per_sec": N, ...}
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_RTF = 50.0  # north-star: 50x realtime per chip


def main():
    import jax

    # persistent compile cache: a warm process start skips the remote
    # 2-5 min/program XLA compiles (measured: full bench 355 s warm vs
    # ~15 min cold through the axon tunnel)
    from cmgan_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(jax.config)
    import jax.numpy as jnp

    from cmgan_tpu.config import CMGANConfig
    from cmgan_tpu.dsp import istft, power_compress, power_uncompress, stft
    from cmgan_tpu.models import TSCNet

    cfg = CMGANConfig()
    dsp = cfg.dsp

    batch = int(os.environ.get("CMGAN_BENCH_BATCH", "16"))
    seg_seconds = int(os.environ.get("CMGAN_BENCH_SEG_SECONDS", "2"))
    use_bf16 = os.environ.get("CMGAN_BENCH_DTYPE", "bf16") == "bf16"
    seg_len = dsp.sample_rate * seg_seconds

    model = TSCNet(cfg.model, dtype=jnp.bfloat16 if use_bf16 else None)
    frames = dsp.num_frames(seg_len)
    spec0 = jnp.zeros((1, frames, dsp.num_freqs, 2), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, spec0)

    @jax.jit
    def enhance(variables, segments):
        spec = stft(segments, dsp.n_fft, dsp.hop)
        packed = power_compress(spec, exponent=dsp.compress_exponent)
        est_real, est_imag = model.apply(variables, packed, train=False)
        est = power_uncompress(
            est_real.astype(jnp.float32),
            est_imag.astype(jnp.float32),
            exponent=dsp.compress_exponent,
        )
        return istft(est, dsp.n_fft, dsp.hop)

    rng = np.random.default_rng(0)
    segments = jnp.asarray(
        rng.standard_normal((batch, seg_len)).astype(np.float32) * 0.1
    )

    # compile + warmup (host fetch forces real completion — more robust
    # than block_until_ready through remote-dispatch transports)
    out = enhance(variables, segments)
    np.asarray(out[0, :4])

    # XLA's own FLOP count for the compiled program (per dispatch), for
    # the MFU line below; best-effort — cost_analysis may be unavailable
    # through some backends.
    program_tflops = None
    try:
        cost = enhance.lower(variables, segments).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        program_tflops = float(cost["flops"]) / 1e12
    except Exception as exc:
        print(f"cost_analysis unavailable: {exc!r}", file=sys.stderr)

    # chain iterations (output feeds next input) so one final host fetch
    # serializes the whole sequence without per-iteration sync overhead
    iters = 10
    t0 = time.perf_counter()
    cur = segments
    for _ in range(iters):
        cur = enhance(variables, cur)
    np.asarray(cur[0, :4])
    dt = time.perf_counter() - t0

    audio_seconds = iters * batch * seg_seconds
    rtf = audio_seconds / dt

    record = {
        "metric": "enhancement_realtime_factor_per_chip",
        "value": round(rtf, 2),
        "unit": "audio_sec/sec (16 kHz, batch %d, %s)"
        % (batch, "bf16" if use_bf16 else "fp32"),
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
    }
    # MFU / roofline: achieved TFLOP/s over the measured wall-clock vs
    # v5e bf16 peak (197 TFLOP/s). Wall time includes dispatch/tunnel
    # overhead, so this is a LOWER bound on device MFU. The model is a
    # 1.83M-param conv/attention net on short sequences — small matmuls
    # by MXU standards — so tens of percent is not expected; the honest
    # hardware framing the README carries.
    if program_tflops is not None:
        achieved = program_tflops * iters / dt
        record["program_tflops_per_dispatch"] = round(program_tflops, 4)
        record["achieved_tflops_per_sec"] = round(achieved, 3)
        record["mfu_vs_v5e_bf16_peak"] = round(achieved / 197.0, 4)
    try:
        record.update(bench_training())
    except Exception as exc:  # training bench is best-effort extra signal
        print(f"training bench failed: {exc!r}", file=sys.stderr)
    print(json.dumps(record))


def bench_training():
    """GAN training throughput, device-label AND host-label schedules."""
    import dataclasses

    import jax

    from cmgan_tpu.config import CMGANConfig, TrainConfig
    from cmgan_tpu.train import Trainer

    import jax.numpy as jnp

    batch = int(os.environ.get("CMGAN_BENCH_TRAIN_BATCH", "8"))
    train_bf16 = os.environ.get("CMGAN_BENCH_TRAIN_DTYPE", "fp32") == "bf16"

    class _Sized:
        def __len__(self):
            return 1000  # steps/epoch for the LR schedule; never iterated

    rng = np.random.default_rng(1)
    clean = rng.standard_normal((batch, TrainConfig().cut_len)).astype(np.float32) * 0.1
    noisy = (clean + rng.standard_normal(clean.shape).astype(np.float32) * 0.03)

    out = {"train_batch": batch, "train_dtype": "bf16" if train_bf16 else "fp32"}
    for mode, prefix in (("device", "train"), ("host", "train_host")):
        cfg = CMGANConfig(
            train=dataclasses.replace(
                TrainConfig(), batch_size=batch, pesq_label_mode=mode
            )
        )
        if batch > 4:
            # fp32 dense-attention (the measured-fastest impl at T=321,
            # see ROADMAP) at batch 16 needs ~48 GB of activations;
            # TSCB remat fits batch 8 in one 16 GB chip at the same
            # utt/s as batch 4 un-rematted
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, remat=True)
            )
        trainer = Trainer(
            cfg, train_loader=_Sized(),
            dtype=jnp.bfloat16 if train_bf16 else None,
        )
        # compile + warmup
        g, d = trainer.train_step(clean, noisy)
        jax.device_get((g, d))

        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            g, d = trainer.train_step(clean, noisy)
        jax.device_get((g, d))  # serializes the async-dispatched chain
        dt = time.perf_counter() - t0
        out[f"{prefix}_steps_per_sec"] = round(iters / dt, 3)
        out[f"{prefix}_utt_per_sec"] = round(iters * batch / dt, 2)
    return out


if __name__ == "__main__":
    sys.exit(main())
