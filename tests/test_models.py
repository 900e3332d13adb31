"""Model structure tests: shapes, parameter counts, train/eval modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmgan_tpu.config import ModelConfig
from cmgan_tpu.models import ConformerBlock, MetricDiscriminator, TSCNet


def _count_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def gen_vars():
    model = TSCNet(ModelConfig())
    spec = jnp.zeros((1, 101, 201, 2))
    return model, model.init({"params": jax.random.key(0)}, spec)


def test_generator_shapes(gen_vars):
    model, variables = gen_vars
    spec = jnp.ones((2, 101, 201, 2)) * 0.1
    real, imag = model.apply(variables, spec)
    assert real.shape == (2, 101, 201)
    assert imag.shape == (2, 101, 201)
    assert np.all(np.isfinite(np.asarray(real)))


def test_generator_param_count(gen_vars):
    # Reference reports 1.83 M trainable params (Figures/Table.PNG).
    _, variables = gen_vars
    n = _count_params(variables["params"])
    assert 1_800_000 < n < 1_870_000, f"generator has {n} params"


def test_generator_variable_collections(gen_vars):
    _, variables = gen_vars
    # BatchNorm running stats from the conformer conv modules.
    assert "batch_stats" in variables
    bn_leaves = jax.tree.leaves(variables["batch_stats"])
    assert len(bn_leaves) > 0


def test_generator_train_mode_runs(gen_vars):
    model, variables = gen_vars
    spec = jnp.ones((1, 101, 201, 2)) * 0.1
    (real, imag), updates = model.apply(
        variables,
        spec,
        train=True,
        rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    assert real.shape == (1, 101, 201)
    # BN stats must actually move in train mode.
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    moved = any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )
    assert moved


def test_generator_different_length(gen_vars):
    # Fully convolutional over time: other frame counts must work.
    model, variables = gen_vars
    spec = jnp.ones((1, 161, 201, 2)) * 0.1
    real, _ = model.apply(variables, spec)
    assert real.shape == (1, 161, 201)


def test_discriminator_shapes_and_range():
    model = MetricDiscriminator(ModelConfig())
    clean = jnp.abs(jax.random.normal(jax.random.key(0), (2, 101, 201)))
    est = jnp.abs(jax.random.normal(jax.random.key(1), (2, 101, 201)))
    variables = model.init({"params": jax.random.key(2)}, clean, est)
    score = model.apply(variables, clean, est)
    assert score.shape == (2, 1)
    s = np.asarray(score)
    assert np.all(s > 0) and np.all(s < 1)


def test_discriminator_spectral_norm_state_updates():
    model = MetricDiscriminator(ModelConfig())
    clean = jnp.abs(jax.random.normal(jax.random.key(0), (2, 101, 201)))
    est = clean * 0.5
    variables = model.init({"params": jax.random.key(2)}, clean, est)
    _, updates = model.apply(
        variables,
        clean,
        est,
        train=True,
        rngs={"dropout": jax.random.key(3)},
        mutable=["batch_stats"],
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    moved = any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )
    assert moved


def test_conformer_block_shape():
    block = ConformerBlock(dim=64, dim_head=16, heads=4)
    x = jax.random.normal(jax.random.key(0), (3, 50, 64))
    variables = block.init({"params": jax.random.key(1)}, x)
    y = block.apply(variables, x)
    assert y.shape == x.shape


def test_generator_gradients_flow(gen_vars):
    model, variables = gen_vars
    spec = jax.random.normal(jax.random.key(0), (1, 101, 201, 2)) * 0.1

    def loss_fn(params):
        real, imag = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, spec
        )
        return jnp.mean(real**2) + jnp.mean(imag**2)

    grads = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    # Nearly all parameters should receive gradient signal.
    nonzero = sum(1 for n in norms if n > 0)
    assert nonzero / len(norms) > 0.95


def test_bf16_attention_softmax_is_fp32():
    """Precision policy (QUALITY_r04 audit): with dtype=bf16 the
    attention matmuls run bf16 on the MXU, but the softmax exp must be
    fp32 — the one bf16-sensitive op left in the body (norms, losses
    and model outputs are already fp32 by flax defaults / operand
    promotion). Pinned at the HLO level: every exponential in the
    lowered program operates on an f32 tensor."""
    import jax.numpy as jnp

    from cmgan_tpu.models.conformer import RelPosAttention

    m = RelPosAttention(
        dim=16, heads=2, dim_head=8, attention_impl="xla",
        dtype=jnp.bfloat16,
    )
    x32 = jnp.linspace(-3, 3, 2 * 32 * 16, dtype=jnp.float32).reshape(2, 32, 16)
    variables = m.init({"params": jax.random.key(0)}, x32.astype(jnp.bfloat16))

    fn = jax.jit(lambda v, x: m.apply(v, x))
    hlo = fn.lower(variables, x32.astype(jnp.bfloat16)).as_text()
    exp_lines = [ln for ln in hlo.splitlines() if "exponential" in ln]
    assert exp_lines, "no softmax exponential found in the lowered program"
    assert all("bf16" not in ln for ln in exp_lines), exp_lines

    # numeric sanity: bf16 compute tracks the fp32 module closely
    m32 = RelPosAttention(dim=16, heads=2, dim_head=8, attention_impl="xla")
    out16 = np.asarray(fn(variables, x32.astype(jnp.bfloat16)), np.float32)
    out32 = np.asarray(m32.apply(variables, x32))
    assert np.all(np.isfinite(out16))
    np.testing.assert_allclose(out16, out32, atol=0.05, rtol=0.1)
