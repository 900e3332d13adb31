"""Shared layers and torch-compatible initializers.

Everything here is channels-last (`[B, T, F, C]` for 2-D feature maps,
`[B, N, C]` for sequences) — the layout XLA:TPU wants for convs/matmuls —
in contrast to the reference's NCHW tensors.

Initializers replicate torch's defaults (kaiming_uniform with a=sqrt(5)
for conv/linear weights, matching uniform bias bounds) so that training
dynamics match the reference recipe, which relies on torch default init
(reference: src/utils.py:5-17 defines kaiming_init but never calls it).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _fan_in_conv(shape: Sequence[int]) -> int:
    # flax conv kernel layout: (*spatial, in_features, out_features)
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return int(shape[-2]) * receptive


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(_fan_in_conv(shape))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_dense_kernel_init(key, shape, dtype=jnp.float32):
    bound = 1.0 / np.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """nn.Conv wrapper with torch-default init and explicit padding.

    padding: 'VALID' or per-spatial-dim (lo, hi) pairs.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: str | Sequence[tuple[int, int]] = "VALID"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        fan_in = (
            in_features // self.feature_group_count * int(np.prod(self.kernel_size))
        )
        return nn.Conv(
            features=self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides) if self.strides else None,
            padding=self.padding,
            feature_group_count=self.feature_group_count,
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=torch_dense_kernel_init,
            bias_init=make_torch_bias_init(x.shape[-1]),
            dtype=self.dtype,
            name="dense",
        )(x)


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True) over channels-last feature maps.

    Normalizes each (sample, channel) over all spatial axes; no running
    stats (torch default track_running_stats=False). eps matches torch.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        spatial_axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=spatial_axes, keepdims=True)
        var = jnp.var(x, axis=spatial_axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return y * scale + bias


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters, init)).

    The parameter is broadcast over the last axis (channels-last).
    """

    num_parameters: int = 1
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha",
            lambda key, shape: jnp.full(shape, self.init, jnp.float32),
            (self.num_parameters,),
        )
        return jnp.where(x >= 0, x, alpha * x)


class LearnableSigmoid(nn.Module):
    """beta * sigmoid(slope * x) with a learnable per-feature slope.

    Reference: src/utils.py:42-50.
    """

    in_features: int = 1
    beta: float = 1.0

    @nn.compact
    def __call__(self, x):
        slope = self.param("slope", nn.initializers.ones, (self.in_features,))
        return self.beta * jax.nn.sigmoid(slope * x)


class SubPixelConv(nn.Module):
    """Sub-pixel (pixel-shuffle) upsampling along the frequency axis.

    Conv produces r*C channels; channel groups are interleaved into the
    freq axis: out[..., f*r + j, c] = conv(pad(x))[..., f, j*C + c].
    Reference: src/models/generator.py:102-119 (SPConvTranspose2d).
    Input [B, T, F, C] -> [B, T, F'*r, C] where F' = F + 2 - (kf - 1).
    """

    features: int
    kernel_size: tuple[int, int] = (1, 3)
    r: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        y = Conv(
            features=self.features * self.r,
            kernel_size=self.kernel_size,
            dtype=self.dtype,
            name="conv",
        )(x)
        b, t, f, _ = y.shape
        y = y.reshape(b, t, f, self.r, self.features)
        return y.reshape(b, t, f * self.r, self.features)


def swish(x):
    return x * jax.nn.sigmoid(x)
