"""Typed configuration for the whole framework.

The reference scatters hyperparameters between two argparse parsers and
hard-coded constants (reference: src/train.py:16-30,47-48, src/evaluation.py:14,62,78,
src/models/discriminator.py:25). Here every knob lives in one place, as
frozen dataclasses so configs are hashable and can be closed over by jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DSPConfig:
    """STFT front-end / back-end parameters.

    Matches torch.stft(n_fft=400, hop=100, hamming, onesided, center=True)
    semantics used at reference src/train.py:81-94 and src/evaluation.py:36-38.
    """

    sample_rate: int = 16_000
    n_fft: int = 400
    hop: int = 100
    compress_exponent: float = 0.3
    # 'fft': jnp.fft.{r,ir}fft HLO; 'matmul': DFT as two MXU matmuls
    # (dsp/stft.py rdft_matmul). 'matmul' is required for seq-sharded
    # TRAINING: XLA:CPU's fft thunk rejects the layouts shard_map picks
    # when both live in one compiled module, and the CPU path is what
    # tests and the driver's multi-chip dryrun execute.
    dft_impl: str = "fft"

    @property
    def num_freqs(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        # center=True reflect padding adds n_fft//2 on both sides.
        return num_samples // self.hop + 1


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """TSCNet generator + metric discriminator hyperparameters.

    Reference: src/models/generator.py:159-172 (num_channel=64,
    num_features=201), src/models/conformer.py:182-214 (heads=4,
    dim_head=16, ff_mult=4, conv_kernel=31), src/train.py:55 (ndf=16).
    """

    num_channels: int = 64
    num_features: int = 201
    num_tscb_blocks: int = 4
    dense_depth: int = 4
    # Conformer
    attn_heads: int = 4
    ff_mult: int = 4
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 31
    attn_dropout: float = 0.2
    ff_dropout: float = 0.2
    conv_dropout: float = 0.0
    max_rel_pos: int = 512
    # 'xla': dense logits; 'flash': Pallas fused kernel; 'auto': flash
    # for sequences >= 512 frames (where dense logits blow HBM).
    attention_impl: str = "auto"
    # rematerialize TSCB blocks in the backward pass (trades ~30% extra
    # forward FLOPs for O(num_blocks) less activation memory; enables
    # large-batch training)
    remat: bool = False
    # Discriminator
    ndf: int = 16
    disc_dropout: float = 0.3

    @property
    def dim_head(self) -> int:
        return self.num_channels // self.attn_heads


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """GAN training loop parameters (reference: src/train.py:16-30,63-66,248-253)."""

    epochs: int = 120
    batch_size: int = 4  # per device, matching reference's per-GPU batch
    log_interval: int = 500
    decay_epochs: int = 30
    init_lr: float = 5e-4
    disc_lr_mult: float = 2.0
    lr_gamma: float = 0.5
    cut_len: int = 16_000 * 2
    # [RI, magnitude, time, metric-GAN] (reference: src/train.py:28)
    loss_weights: Tuple[float, float, float, float] = (0.1, 0.9, 0.2, 0.05)
    data_dir: str = ""
    save_model_dir: str = "./saved_model"
    num_workers: int = 2
    seed: int = 0
    # PESQ labels normalized as (pesq - 1) / 3.5 (reference: src/models/discriminator.py:25)
    pesq_norm_offset: float = 1.0
    pesq_norm_scale: float = 3.5
    # 'host': labels via the native C++ scorer (reference-faithful,
    #   synchronous device->host round trip per step);
    # 'host_async': same exact scorer, but overlapped — labels for step
    #   t are computed in a background thread while step t+1's generator
    #   runs, and the D update lands one step late (SURVEY §7's planned
    #   async mode; trades reference-exact ordering for removing the
    #   per-step host sync from the critical path);
    # 'device': labels via the on-TPU batched scorer (pesq_jax) — the
    #   whole G+label+D step fuses into one XLA program.
    pesq_label_mode: str = "host"
    # Time-domain L1 loss target. 'reference' preserves the reference
    # quirk (src/train.py:140-141,190: est_audio lives in the
    # RMS-normalized domain but generator_outputs["clean"] is the RAW
    # batch waveform, so with c = sqrt(L/sum(noisy^2)) >> 1 the L1 term
    # drags the output gain toward 1/c of the true target — measured on
    # the round-2 checkpoint as a 2.36x output attenuation costing
    # ~4.5 dB of speech-frame segSNR, tools/diagnose_ssnr.py).
    # 'normalized' compares est_audio against clean * c, gain-consistent
    # with the mag/RI spectral terms.
    time_loss_domain: str = "reference"
    # Polyak/EMA averaging of the generator parameters: after every G
    # update the trainer maintains ema <- d*ema + (1-d)*params as a
    # separate on-device tree (one fused elementwise pass; the
    # TrainState pytree and checkpoint format are unchanged). 0.0
    # disables. The reference has no equivalent; this is a standard
    # production-serving lever (evaluate/export the smoothed weights
    # while training the raw ones). See Trainer.ema_variables().
    gen_ema_decay: float = 0.0
    # Restrict the SUPERVISED generator losses (RI, magnitude, time) to
    # a [start, end) sample range of the cut_len training window —
    # the streaming fine-tune recipe (QUALITY_r04 §5): with the range
    # set to the emission region of a deployment window shape
    # (left_context .. left_context + chunk + lookahead), every
    # gradient teaches "enhance THESE samples given this much past and
    # this little future", matching what StreamingEnhancer emits. The
    # metric-GAN term and the D step stay whole-window (D remains a
    # global quality scorer; its small 0.05 weight regularizes the
    # unsupervised remainder). None = whole window (reference
    # semantics, src/train.py:124-151). No reference counterpart —
    # the reference has no streaming path.
    loss_region: Optional[Tuple[int, int]] = None


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Inference / evaluation parameters (reference: src/evaluation.py:78,103-111)."""

    cut_len: int = 16_000 * 16
    save_tracks: bool = False
    save_dir: str = "./saved_tracks"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for SPMD training/inference.

    The reference supports data parallelism only (DDP over NCCL,
    src/train.py:68-69). We keep `data` as the primary axis and expose a
    `seq` axis for long-form time-axis sharding (BASELINE.json config 5).
    """

    data_axis: str = "data"
    seq_axis: str = "seq"
    data_parallel: int = -1  # -1: all devices
    seq_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class CMGANConfig:
    dsp: DSPConfig = dataclasses.field(default_factory=DSPConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def long_form_48k(
    num_tscb_blocks: int = 6,
    num_channels: int = 64,
    window_seconds: int = 30,
    seq_parallel: int = 1,
) -> CMGANConfig:
    """Scaled 48 kHz / long-form denoising preset (BASELINE config 5).

    Same 12.5 ms frame rate as the 16 kHz config (n_fft/hop scaled 3x,
    601 frequency bins), deeper TS-conformer stack, and long analysis
    windows — the time conformer runs through the flash-attention
    kernel ('auto' kicks in at >=512 frames), so a 30 s window is a
    2401-frame attention context instead of an OOM. Scale-out is data
    parallel over the mesh; pass seq_parallel > 1 to also shard the
    time axis over the `seq` mesh axis (ops/seq_attention.py) when a
    single window exceeds one chip's budget.
    """
    dsp = DSPConfig(
        sample_rate=48_000, n_fft=1200, hop=300,
        dft_impl="matmul" if seq_parallel > 1 else "fft",
    )
    model = ModelConfig(
        num_channels=num_channels,
        num_features=dsp.num_freqs,
        num_tscb_blocks=num_tscb_blocks,
        attention_impl="seq" if seq_parallel > 1 else "auto",
    )
    train = TrainConfig(cut_len=dsp.sample_rate * 2)
    ev = EvalConfig(cut_len=dsp.sample_rate * window_seconds)
    mesh = MeshConfig(seq_parallel=seq_parallel)
    return CMGANConfig(dsp=dsp, model=model, train=train, eval=ev, mesh=mesh)
