"""Fused LayerNorm kernel (ops/fused_norm.py) vs flax nn.LayerNorm.

The kernel replaces the ~48 nn.LayerNorm wrappers in the TS-conformer
stack (reference: src/models/conformer.py:182-222), so parity with
flax's numerics (fp32 statistics, fast-variance form) is the contract.
On CPU the public entry point falls back to identical plain-XLA math;
the Pallas kernel body itself is exercised through interpret mode.
"""

import os
import sys

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cmgan_tpu.ops.fused_norm import _ln_forward, fused_layernorm


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def _flax_ln(x, scale, bias, eps=1e-5):
    mod = nn.LayerNorm(epsilon=eps)
    return mod.apply({"params": {"scale": scale, "bias": bias}}, x)


def test_kernel_matches_flax_fp32(rng):
    x = jnp.asarray(rng.standard_normal((7, 321, 64)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 64).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-0.5, 0.5, 64).astype(np.float32))
    got = _ln_forward(x.reshape(-1, 64), scale, bias, 1e-5, interpret=True)
    want = _flax_ln(x, scale, bias).reshape(-1, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6, rtol=1e-6)


def test_kernel_ragged_rows(rng):
    """n not a multiple of the row block: partial final grid step."""
    x = jnp.asarray(rng.standard_normal((1500, 64)).astype(np.float32))
    scale = jnp.ones(64, jnp.float32)
    bias = jnp.zeros(64, jnp.float32)
    got = _ln_forward(x, scale, bias, 1e-5, interpret=True)
    want = _flax_ln(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6, rtol=1e-6)


def test_kernel_bf16_matches_fp32_stats(rng):
    """bf16 I/O with fp32 statistics: output == flax-LN-then-cast."""
    x32 = rng.standard_normal((2048, 64)).astype(np.float32)
    x = jnp.asarray(x32).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 64).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-0.5, 0.5, 64).astype(np.float32))
    got = _ln_forward(x, scale, bias, 1e-5, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _flax_ln(x, scale, bias).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_public_entry_matches_flax(rng):
    x = jnp.asarray(rng.standard_normal((3, 11, 64)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 64).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-0.5, 0.5, 64).astype(np.float32))
    got = fused_layernorm(x, scale, bias)
    want = _flax_ln(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6, rtol=1e-6)


def test_custom_vjp_matches_autodiff(rng):
    x = jnp.asarray(rng.standard_normal((5, 33, 64)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 64).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-0.5, 0.5, 64).astype(np.float32))

    def loss_fused(x, s, b):
        return jnp.sum(jnp.sin(fused_layernorm(x, s, b)))

    def loss_flax(x, s, b):
        return jnp.sum(jnp.sin(_flax_ln(x, s, b)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_flax = jax.grad(loss_flax, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_fused, g_flax):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_models_use_plain_nn_layernorm():
    """The conformer must use nn.LayerNorm, not the fused kernel: the
    kernel measured 3x SLOWER at the model's 64-feature shapes on v5e
    (see ops/fused_norm.py docstring for the measurement record)."""
    import cmgan_tpu.models.layers as layers

    assert not hasattr(layers, "LayerNorm")
    import inspect

    import cmgan_tpu.models.conformer as conformer

    src = inspect.getsource(conformer)
    assert "nn.LayerNorm" in src and "fused_layernorm" not in src
