"""Flash rel-pos attention kernel vs the XLA reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmgan_tpu.ops.flash_attention import (
    flash_rel_attention,
    make_rel_band,
    reference_attention,
)

MAX_POS = 512


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("t", [64, 128, 200, 321])
def test_matches_reference(rng, t):
    g, d = 6, 16
    q = _rand(rng, g, t, d) * 0.5
    k = _rand(rng, g, t, d) * 0.5
    v = _rand(rng, g, t, d)
    table = _rand(rng, 2 * MAX_POS + 1, d)

    out = flash_rel_attention(q, k, v, table, MAX_POS)
    band = make_rel_band(np.asarray(table), t, MAX_POS)
    ref = reference_attention(q, k, v, jnp.asarray(band), t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_clipping_active(rng):
    # T > max_pos so distance clipping takes effect
    g, t, d, max_pos = 2, 160, 16, 64
    q = _rand(rng, g, t, d) * 0.5
    k = _rand(rng, g, t, d) * 0.5
    v = _rand(rng, g, t, d)
    table = _rand(rng, 2 * max_pos + 1, d)
    out = flash_rel_attention(q, k, v, table, max_pos)
    band = make_rel_band(np.asarray(table), t, max_pos)
    ref = reference_attention(q, k, v, jnp.asarray(band), t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_gradients_flow_through_fallback(rng):
    g, t, d = 2, 64, 16
    q = _rand(rng, g, t, d) * 0.5
    k = _rand(rng, g, t, d) * 0.5
    v = _rand(rng, g, t, d)
    table = _rand(rng, 2 * MAX_POS + 1, d)

    def loss_flash(q, k, v, table):
        return jnp.sum(flash_rel_attention(q, k, v, table, MAX_POS) ** 2)

    def loss_ref(q, k, v, table):
        band = make_rel_band(np.asarray(jax.lax.stop_gradient(table)), t, MAX_POS)
        # trace band from table for gradient:
        s = np.arange(2 * t - 1) - (t - 1)
        idx = np.clip(s, -MAX_POS, MAX_POS) + MAX_POS
        return jnp.sum(reference_attention(q, k, v, table[idx], t) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, table)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, table)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("t,max_pos", [(200, MAX_POS), (300, 96)])
def test_gradients_multiblock_and_clipping(rng, t, max_pos):
    """Backward kernel over multiple q-blocks and with active clipping."""
    g_, d = 3, 16
    q = _rand(rng, g_, t, d) * 0.5
    k = _rand(rng, g_, t, d) * 0.5
    v = _rand(rng, g_, t, d)
    table = _rand(rng, 2 * max_pos + 1, d)

    def loss_flash(q, k, v, table):
        return jnp.sum(jnp.sin(flash_rel_attention(q, k, v, table, max_pos)))

    def loss_ref(q, k, v, table):
        s = np.arange(2 * t - 1) - (t - 1)
        idx = np.clip(s, -max_pos, max_pos) + max_pos
        return jnp.sum(jnp.sin(reference_attention(q, k, v, table[idx], t)))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, table)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, table)
    for name, a, b in zip("qkvE", g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=f"grad wrt {name}",
        )


def test_relpos_attention_module_flash_matches_xla(rng):
    """RelPosAttention(attention_impl='flash') == 'xla' at the module level.

    Guards the softmax-scale contract between the module and the kernel:
    the module pre-scales q once, so the rel table must be passed
    UNSCALED (a double-applied scale shrinks pos logits by scale^2 and
    silently skews every >=512-frame eval and all long-form configs).
    n >= 512 so the 'auto' policy would also take this path.
    """
    from cmgan_tpu.models.conformer import RelPosAttention

    b, n, dim = 2, 544, 64
    x = _rand(rng, b, n, dim) * 0.5

    flash = RelPosAttention(dim, attention_impl="flash")
    xla = RelPosAttention(dim, attention_impl="xla")
    variables = flash.init({"params": jax.random.key(0)}, x)

    out_flash = flash.apply(variables, x, train=False)
    out_xla = xla.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), atol=5e-5, rtol=1e-4
    )


def test_train_mode_flash_matches_xla_with_dropout(rng):
    """TRAIN-mode parity with attn dropout 0.2: the reference applies
    attention dropout to the OUTPUT after to_out (reference
    src/models/conformer.py:88,133), never to the weights, so the fused
    kernel is exact in train mode too — same dropout rng => identical
    samples dropped on both paths. Round 2 wrongly gated flash/seq out
    of train mode; this pins the gate's removal."""
    from cmgan_tpu.models.conformer import RelPosAttention

    b, n, dim = 2, 160, 64
    x = _rand(rng, b, n, dim) * 0.5

    flash = RelPosAttention(dim, dropout=0.2, attention_impl="flash")
    xla = RelPosAttention(dim, dropout=0.2, attention_impl="xla")
    variables = flash.init({"params": jax.random.key(0)}, x)
    dkey = jax.random.key(7)

    out_flash = flash.apply(variables, x, train=True, rngs={"dropout": dkey})
    out_xla = xla.apply(variables, x, train=True, rngs={"dropout": dkey})
    # identical dropout mask on both paths: zeros coincide exactly
    np.testing.assert_array_equal(
        np.asarray(out_flash) == 0.0, np.asarray(out_xla) == 0.0
    )
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), atol=1e-4, rtol=1e-3
    )

    # gradients also agree (kernel bwd runs in train mode now)
    def loss(fn):
        def inner(params):
            y = fn.apply(
                {"params": params}, x, train=True, rngs={"dropout": dkey}
            )
            return jnp.sum(y * y)
        return inner

    g_flash = jax.grad(loss(flash))(variables["params"])
    g_xla = jax.grad(loss(xla))(variables["params"])
    flat_f = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(g_flash)}
    flat_x = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(g_xla)}
    assert flat_f.keys() == flat_x.keys()
    for name in flat_f:
        np.testing.assert_allclose(
            np.asarray(flat_f[name]), np.asarray(flat_x[name]),
            atol=5e-4, rtol=5e-3, err_msg=name,
        )


def test_train_mode_actually_uses_pallas_kernel():
    """Pin WHICH impl executes: with attention_impl='flash' in TRAIN
    mode (dropout 0.2) the traced program must contain a pallas_call —
    round 2's silent fallback to dense attention cannot return."""
    from cmgan_tpu.models.conformer import RelPosAttention

    b, n, dim = 1, 96, 32
    x = jnp.zeros((b, n, dim))
    mod = RelPosAttention(dim, heads=2, dim_head=16, dropout=0.2,
                          attention_impl="flash")
    variables = mod.init({"params": jax.random.key(0)}, x)

    jaxpr = jax.make_jaxpr(
        lambda v, x: mod.apply(v, x, train=True,
                               rngs={"dropout": jax.random.key(1)})
    )(variables, x)
    prims = {e.primitive.name for e in jaxpr.eqns}

    def all_prims(jx, acc):
        for e in jx.eqns:
            acc.add(e.primitive.name)
            for p in e.params.values():
                if hasattr(p, "jaxpr"):
                    all_prims(p.jaxpr, acc)
                elif isinstance(p, (list, tuple)):
                    for q in p:
                        if hasattr(q, "jaxpr"):
                            all_prims(q.jaxpr, acc)
        return acc

    prims = all_prims(jaxpr.jaxpr, set(prims))
    assert "pallas_call" in prims, sorted(prims)

    # and the xla impl must NOT contain one
    mod_x = RelPosAttention(dim, heads=2, dim_head=16, dropout=0.2,
                            attention_impl="xla")
    jaxpr_x = jax.make_jaxpr(
        lambda v, x: mod_x.apply(v, x, train=True,
                                 rngs={"dropout": jax.random.key(1)})
    )(variables, x)
    assert "pallas_call" not in all_prims(jaxpr_x.jaxpr, set())
