"""TSCNet generator: dense dilated encoder, four two-stage (time/freq)
conformer blocks, decoupled mask + complex decoders.

Re-designed from the behavior of reference src/models/generator.py:
channels-last [B, T, F, C] throughout (the reference is NCHW with
permutes around every block). The time/freq conformer "axis swap" is a
pair of reshapes that XLA lowers to free layout changes.

Input:  packed compressed spectrogram [B, T, F, 2] (re, im).
Output: (est_real, est_imag), each [B, T, F].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cmgan_tpu.config import ModelConfig
from cmgan_tpu.models.conformer import ConformerBlock
from cmgan_tpu.models.layers import (
    Conv,
    InstanceNorm,
    PReLU,
    SubPixelConv,
    make_torch_bias_init,
    torch_conv_kernel_init,
)


class DilatedDenseNet(nn.Module):
    """Densely connected dilated conv stack, time-causal.

    Per layer i: pad time (front 2^i, back 0) and freq (1, 1); conv
    kernel (2, 3) with time dilation 2^i on the concatenation of all
    previous features; InstanceNorm; PReLU. Reference:
    src/models/generator.py:6-47.
    """

    depth: int = 4
    channels: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        skip = x
        out = x
        for i in range(self.depth):
            dil = 2**i
            y = jnp.pad(skip, ((0, 0), (dil, 0), (1, 1), (0, 0)))
            y = nn.Conv(
                features=self.channels,
                kernel_size=(2, 3),
                kernel_dilation=(dil, 1),
                padding="VALID",
                kernel_init=torch_conv_kernel_init,
                bias_init=make_torch_bias_init(self.channels * (i + 1) * 2 * 3),
                dtype=self.dtype,
                name=f"conv{i + 1}",
            )(y)
            y = InstanceNorm(name=f"norm{i + 1}")(y)
            out = PReLU(self.channels, name=f"prelu{i + 1}")(y)
            skip = jnp.concatenate([out, skip], axis=-1)
        return out


class DenseEncoder(nn.Module):
    """1x1 conv (3->C) + IN + PReLU -> DilatedDenseNet -> freq-downsample
    conv k=(1,3) stride (1,2) pad (0,1) + IN + PReLU. F: 201 -> 101.

    Reference: src/models/generator.py:50-69.
    """

    channels: int = 64
    dense_depth: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = Conv(self.channels, (1, 1), dtype=self.dtype, name="conv_in")(x)
        x = InstanceNorm(name="norm_in")(x)
        x = PReLU(self.channels, name="prelu_in")(x)
        x = DilatedDenseNet(
            self.dense_depth, self.channels, dtype=self.dtype, name="dense"
        )(x)
        x = Conv(
            self.channels,
            (1, 3),
            strides=(1, 2),
            padding=((0, 0), (1, 1)),
            dtype=self.dtype,
            name="conv_down",
        )(x)
        x = InstanceNorm(name="norm_down")(x)
        x = PReLU(self.channels, name="prelu_down")(x)
        return x


class TSCB(nn.Module):
    """Two-stage conformer block: time conformer over [B*F, T, C] then
    frequency conformer over [B*T, F, C], each with a residual.

    Reference: src/models/generator.py:72-99.
    """

    cfg: ModelConfig
    dtype: jnp.dtype | None = None

    def _block(self, name: str, attention_impl: str | None = None) -> ConformerBlock:
        c = self.cfg
        return ConformerBlock(
            dim=c.num_channels,
            dim_head=c.dim_head,
            heads=c.attn_heads,
            ff_mult=c.ff_mult,
            conv_expansion_factor=c.conv_expansion_factor,
            conv_kernel_size=c.conv_kernel_size,
            attn_dropout=c.attn_dropout,
            ff_dropout=c.ff_dropout,
            conv_dropout=c.conv_dropout,
            max_pos_emb=c.max_rel_pos,
            attention_impl=attention_impl or c.attention_impl,
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, f, c = x.shape
        # 'seq' (time-axis sharding) applies to the TIME conformer only;
        # the freq conformer (<=201 tokens) never needs it (SURVEY §5)
        freq_impl = "auto" if self.cfg.attention_impl == "seq" else None
        # time attention: sequences along T, one per (batch, freq) row
        xt = x.transpose(0, 2, 1, 3).reshape(b * f, t, c)
        xt = self._block("time_conformer")(xt, train=train) + xt
        # freq attention: sequences along F, one per (batch, time) row
        xf = xt.reshape(b, f, t, c).transpose(0, 2, 1, 3).reshape(b * t, f, c)
        xf = self._block("freq_conformer", freq_impl)(xf, train=train) + xf
        return xf.reshape(b, t, f, c)


class MaskDecoder(nn.Module):
    """DilatedDenseNet -> sub-pixel freq upsample (x2) -> conv k=(1,2)
    C->1 -> IN + PReLU -> 1x1 conv -> per-frequency PReLU(init=-0.25).

    Output [B, T, F] is a (possibly negative) magnitude mask.
    Reference: src/models/generator.py:122-139.
    """

    num_features: int
    channels: int = 64
    dense_depth: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = DilatedDenseNet(
            self.dense_depth, self.channels, dtype=self.dtype, name="dense"
        )(x)
        x = SubPixelConv(self.channels, (1, 3), r=2, dtype=self.dtype, name="sub_pixel")(x)
        x = Conv(1, (1, 2), dtype=self.dtype, name="conv_1")(x)
        x = InstanceNorm(name="norm")(x)
        x = PReLU(1, name="prelu")(x)
        x = Conv(1, (1, 1), dtype=self.dtype, name="final_conv")(x)
        x = x[..., 0]  # [B, T, F]
        return PReLU(self.num_features, init=-0.25, name="prelu_out")(x)


class ComplexDecoder(nn.Module):
    """DilatedDenseNet -> sub-pixel freq upsample (x2) -> IN + PReLU ->
    conv k=(1,2) C->2. Output [B, T, F, 2].

    Reference: src/models/generator.py:142-156.
    """

    channels: int = 64
    dense_depth: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = DilatedDenseNet(
            self.dense_depth, self.channels, dtype=self.dtype, name="dense"
        )(x)
        x = SubPixelConv(self.channels, (1, 3), r=2, dtype=self.dtype, name="sub_pixel")(x)
        x = InstanceNorm(name="norm")(x)
        x = PReLU(self.channels, name="prelu")(x)
        x = Conv(2, (1, 2), dtype=self.dtype, name="conv")(x)
        return x


class TSCNet(nn.Module):
    """The CMGAN generator. Reference: src/models/generator.py:159-196."""

    cfg: ModelConfig = ModelConfig()
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, spec, *, train: bool = False):
        # spec: [B, T, F, 2] compressed (re, im)
        re, im = spec[..., 0], spec[..., 1]
        mag = jnp.sqrt(re * re + im * im)[..., None]  # [B, T, F, 1]
        phase = jnp.arctan2(im, re)[..., None]
        x = jnp.concatenate([mag, spec], axis=-1)  # [B, T, F, 3]

        x = DenseEncoder(
            self.cfg.num_channels, self.cfg.dense_depth, dtype=self.dtype, name="encoder"
        )(x)
        # optional rematerialization: recompute each TSCB forward during
        # the backward pass instead of keeping its activations live
        block_cls = (
            nn.remat(TSCB, static_argnums=(2,)) if self.cfg.remat else TSCB
        )
        for i in range(self.cfg.num_tscb_blocks):
            x = block_cls(self.cfg, dtype=self.dtype, name=f"tscb_{i + 1}")(
                x, train
            )

        mask = MaskDecoder(
            self.cfg.num_features,
            self.cfg.num_channels,
            self.cfg.dense_depth,
            dtype=self.dtype,
            name="mask_decoder",
        )(x)[..., None]
        out_mag = mask * mag

        complex_out = ComplexDecoder(
            self.cfg.num_channels, self.cfg.dense_depth, dtype=self.dtype, name="complex_decoder"
        )(x)

        final_real = out_mag[..., 0] * jnp.cos(phase[..., 0]) + complex_out[..., 0]
        final_imag = out_mag[..., 0] * jnp.sin(phase[..., 0]) + complex_out[..., 1]
        return final_real, final_imag
