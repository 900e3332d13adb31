"""Metric discriminator: predicts (normalized) PESQ of an enhanced
magnitude spectrogram given the clean one.

Re-designed from reference src/models/discriminator.py:29-64:
4x [spectral-norm conv k=4 s=2 p=1 (no bias) -> InstanceNorm -> PReLU]
with channels 2 -> ndf -> 2ndf -> 4ndf -> 8ndf, global max-pool,
SN-linear 8ndf->4ndf, dropout 0.3, PReLU, SN-linear ->1,
learnable sigmoid.

Layout: channels-last [B, T, F, C]. Spectral-norm power-iteration
vectors live in the 'batch_stats' collection (updated when train=True),
the JAX analog of torch's in-place u/v buffers.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cmgan_tpu.config import ModelConfig
from cmgan_tpu.models.layers import (
    InstanceNorm,
    LearnableSigmoid,
    PReLU,
    make_torch_bias_init,
    torch_conv_kernel_init,
    torch_dense_kernel_init,
)


class MetricDiscriminator(nn.Module):
    cfg: ModelConfig = ModelConfig()
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, clean_mag, est_mag, *, train: bool = False):
        """clean_mag, est_mag: [B, T, F] or [B, T, F, 1] -> score [B, 1] in (0, 1)."""
        if clean_mag.ndim == 3:
            clean_mag = clean_mag[..., None]
        if est_mag.ndim == 3:
            est_mag = est_mag[..., None]
        x = jnp.concatenate([clean_mag, est_mag], axis=-1)

        ndf = self.cfg.ndf
        for i, ch in enumerate((ndf, 2 * ndf, 4 * ndf, 8 * ndf)):
            conv = nn.Conv(
                features=ch,
                kernel_size=(4, 4),
                strides=(2, 2),
                padding=((1, 1), (1, 1)),
                use_bias=False,
                kernel_init=torch_conv_kernel_init,
                dtype=self.dtype,
                name=f"conv{i + 1}",
            )
            x = nn.SpectralNorm(conv, collection_name="batch_stats")(
                x, update_stats=train
            )
            x = InstanceNorm(name=f"norm{i + 1}")(x)
            x = PReLU(ch, name=f"prelu{i + 1}")(x)

        # AdaptiveMaxPool2d(1): global max over both spatial axes.
        x = jnp.max(x, axis=(1, 2))  # [B, 8*ndf]

        fc1 = nn.Dense(
            features=4 * ndf,
            kernel_init=torch_dense_kernel_init,
            bias_init=make_torch_bias_init(8 * ndf),
            dtype=self.dtype,
            name="fc1",
        )
        x = nn.SpectralNorm(fc1, collection_name="batch_stats")(x, update_stats=train)
        x = nn.Dropout(self.cfg.disc_dropout, deterministic=not train)(x)
        x = PReLU(4 * ndf, name="fc_prelu")(x)
        fc2 = nn.Dense(
            features=1,
            kernel_init=torch_dense_kernel_init,
            bias_init=make_torch_bias_init(4 * ndf),
            dtype=self.dtype,
            name="fc2",
        )
        x = nn.SpectralNorm(fc2, collection_name="batch_stats")(x, update_stats=train)
        return LearnableSigmoid(1, name="sigmoid")(x)
