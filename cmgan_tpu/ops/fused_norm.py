"""Single-pass fused LayerNorm kernel (Pallas/TPU) — NOT used by the
models; kept as a documented negative result.

The TS-conformer stack runs ~48 LayerNorms per forward over
[B*F, T, 64]-scale tensors (reference: src/models/conformer.py:182-222
wraps every sublayer in nn.LayerNorm). The hypothesis was that flax's
fp32-promoting LayerNorm cost extra HBM passes in a bf16 model and a
one-pass kernel would reclaim them. MEASURED on v5e (2026-08-17,
bf16, bench shapes [1616,321,64] and [5136,101,64]): the kernel runs
2.5-2.8 ms/norm vs 0.8-0.9 ms for the plain-XLA form — 3x SLOWER, and
swapping it into the models dropped the end-to-end bench from ~155x to
~89x realtime. Two reasons: (a) the feature axis is 64, so the mean/var
reduction crosses half a 128-lane register — a cross-lane reduction the
VPU does poorly, while XLA reassociates it; (b) `pallas_call` is a
fusion barrier, so the norm stops fusing into its matmul neighbors.
The models therefore use `nn.LayerNorm`; this kernel stays for shapes
where it could win (feature dim >= 128-multiple, memory-bound rows)
and as the measurement record.

Numerics match flax exactly (fp32 stats, `use_fast_variance`
E[x^2]-E[x]^2 form, eps inside rsqrt, fp32 affine). Training uses a
custom VJP whose backward is plain XLA.
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
