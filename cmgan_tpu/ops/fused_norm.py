"""Single-pass fused LayerNorm kernel (Pallas/TPU).

The TS-conformer stack runs ~48 LayerNorms per forward over
[B*F, T, 64]-scale tensors (reference: src/models/conformer.py:182-222
wraps every sublayer in nn.LayerNorm). Under a bf16 model, flax's
LayerNorm promotes the whole tensor to fp32 for the statistics and
emits convert+reduce+normalize fusions that read the activation from
HBM more than once — ~30-40 ms of the 2 s-batch-16 pipeline (measured,
ROADMAP.md "Norm layers").

This kernel does the whole thing in one HBM pass per tensor: each grid
step loads a block of rows into VMEM once, computes fp32 mean/variance
over the feature axis in registers, normalizes, applies scale/bias, and
stores in the input dtype. Numerics match flax exactly (fp32 stats,
`use_fast_variance` E[x^2]-E[x]^2 form, eps inside rsqrt, fp32 affine).

Training uses a custom VJP whose backward is plain XLA (the standard
dx = rstd*(g - mean(g) - xhat*mean(g*xhat)) form with stats recomputed
from the saved input): the forward/inference path is the hot one, and
the XLA backward fuses into the surrounding gradient computation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ROWS = 1024  # rows per grid step: [1024, 64] fp32 block = 256 KiB VMEM


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # [R, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    # flax use_fast_variance form: E[x^2] - E[x]^2
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_forward(x2d, scale, bias, eps: float, interpret: bool | None = None):
    n, c = x2d.shape
    rows = min(_ROWS, n)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(pl.cdiv(n, rows),),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), x2d.dtype),
        interpret=interpret,
    )(x2d, scale[None], bias[None])


def _ln_reference(x, scale, bias, eps: float):
    """Plain-XLA LayerNorm, same math/dtypes as the kernel (used on
    non-TPU backends, where interpret-mode Pallas would be pure
    overhead — numerics are pinned identical by tests)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layernorm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over the last axis; x [..., C], scale/bias [C].

    Output dtype == x dtype (statistics and affine in fp32), matching
    flax nn.LayerNorm followed by the consumer's cast in a bf16 model.
    """
    if jax.default_backend() != "tpu":
        return _ln_reference(x, scale, bias, eps)
    shape = x.shape
    out = _ln_forward(x.reshape(-1, shape[-1]), scale, bias, eps)
    return out.reshape(shape)


def _fwd(x, scale, bias, eps):
    return fused_layernorm(x, scale, bias, eps), (x, scale)


def _bwd(eps, res, g):
    x, scale = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    gs = gf * scale.astype(jnp.float32)
    dx = rstd * (
        gs
        - jnp.mean(gs, axis=-1, keepdims=True)
        - xhat * jnp.mean(gs * xhat, axis=-1, keepdims=True)
    )
    axes = tuple(range(x.ndim - 1))
    dscale = jnp.sum(gf * xhat, axis=axes)
    dbias = jnp.sum(gf, axis=axes)
    return dx.astype(x.dtype), dscale.astype(scale.dtype), dbias.astype(scale.dtype)


fused_layernorm.defvjp(_fwd, _bwd)
