"""Conformer block: half-step FFNs, MHSA with Shaw relative positions,
and a depthwise-conv/GLU module.

Re-designed from the behavior of the reference's vendored lucidrains
conformer (reference: src/models/conformer.py:75-222):
  x += 0.5*FF1(LN x); x += Attn(LN x); x += ConvModule(x); x += 0.5*FF2(LN x);
  x = LN(x)

TPU notes:
- attention runs as batched matmuls over [B, H, N, D] with N <= 321, so a
  single XLA fusion handles it; the Shaw relative-position term is a
  second q @ E^T matmul over a [N, N] clipped-distance gather.
- the depthwise conv module stays channels-last ([B, N, C]) so the
  pointwise convs are plain matmuls on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cmgan_tpu.models.layers import Conv, Dense, swish


class FeedForward(nn.Module):
    """Linear d->mult*d, swish, dropout, Linear ->d, dropout.

    Reference: src/models/conformer.py:136-148.
    """

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = Dense(self.dim * self.mult, dtype=self.dtype, name="in_proj")(x)
        x = swish(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = Dense(self.dim, dtype=self.dtype, name="out_proj")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class RelPosAttention(nn.Module):
    """MHSA with Shaw relative positional embedding.

    pos_attn[i, j] = q_i . E[clip(i - j, ±max_pos) + max_pos] * scale
    added to the content logits. Reference: src/models/conformer.py:75-133.

    attention_impl: 'xla' materializes dense logits; 'flash' uses the
    fused Pallas kernel (cmgan_tpu/ops/flash_attention.py, fwd + bwd);
    'auto' switches to flash at >=512 frames, where dense [*, T, T]
    logits dominate HBM; 'seq' shards the time axis over the ambient
    mesh's `seq` axis (ops/seq_attention.py — cross-chip long-form;
    wrap apply in jax.sharding.set_mesh).

    All impls are exact in TRAIN mode too: the reference applies
    `dropout` to the attention OUTPUT after the to_out projection
    (src/models/conformer.py:88,133 — `self.dropout(out)`), never to
    the attention weights, so the fused kernels compute the identical
    train-mode math and the output dropout happens outside them here
    (round 2 gated the kernels out of train mode on the mistaken
    premise that weight-dropout was needed; tests pin the train-mode
    flash==xla equivalence).
    """

    dim: int
    heads: int = 4
    dim_head: int = 16
    dropout: float = 0.0
    max_pos_emb: int = 512
    attention_impl: str = "auto"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        inner = h * d
        scale = d**-0.5

        q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = Dense(2 * inner, use_bias=False, dtype=self.dtype, name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, d).transpose(0, 2, 1, 3)

        rel_table = self.param(
            "rel_pos_emb",
            nn.initializers.normal(stddev=1.0),
            (2 * self.max_pos_emb + 1, d),
        )

        use_seq = self.attention_impl == "seq"
        use_flash = (
            self.attention_impl == "flash"
            or (self.attention_impl == "auto" and n >= 512)
        )
        if use_seq or use_flash:
            from cmgan_tpu.ops.flash_attention import flash_rel_attention

            compute = jnp.float32 if self.dtype is None else self.dtype
            # The kernels compute q.k + q.rel with no internal scale, so
            # the pre-scaled q carries the single softmax scale for BOTH
            # terms — the table must be passed unscaled.
            qs = (q * scale).astype(compute).reshape(b * h, n, d)
            ks = k.astype(compute).reshape(b * h, n, d)
            vs = v.astype(compute).reshape(b * h, n, d)
            table = jnp.asarray(rel_table).astype(compute)
            if use_seq:
                from cmgan_tpu.ops.seq_attention import seq_rel_attention

                out = seq_rel_attention(
                    qs, ks, vs, table, self.max_pos_emb, batch_axis="data"
                ).reshape(b, h, n, d)
            else:
                out = flash_rel_attention(
                    qs, ks, vs, table, self.max_pos_emb
                ).reshape(b, h, n, d)
        else:
            logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
            # Shaw relative positions, clipped to ±max_pos_emb.
            dist = np.arange(n)[:, None] - np.arange(n)[None, :]
            dist = (
                np.clip(dist, -self.max_pos_emb, self.max_pos_emb)
                + self.max_pos_emb
            )
            rel_emb = jnp.asarray(rel_table)[dist]  # [n, n, d]
            if self.dtype is not None:
                rel_emb = rel_emb.astype(self.dtype)
            logits = logits + jnp.einsum("bhid,ijd->bhij", q, rel_emb) * scale
            # softmax always in fp32: with dtype=bf16 the matmuls stay
            # at MXU bf16 rate, but a bf16 exp/normalize visibly skews
            # attention weights (the one remaining bf16-sensitive op —
            # norms and losses are already fp32, see QUALITY_r04
            # precision audit). Free for fp32 configs.
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)

        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class ConformerConvModule(nn.Module):
    """LN -> pointwise conv (2x expansion) -> GLU -> depthwise conv k=31
    -> BatchNorm -> swish -> pointwise conv -> dropout.

    Reference: src/models/conformer.py:151-176. BatchNorm is the only
    batch-statistics layer in the whole model; under SPMD data-parallel
    jit the batch mean/var reductions are global (sync-BN), which the
    reference's per-replica DDP BN only approximates.
    """

    dim: int
    expansion_factor: int = 2
    kernel_size: int = 31
    dropout: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inner = self.dim * self.expansion_factor
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        y = Conv(2 * inner, (1,), dtype=self.dtype, name="pw_in")(y)
        gate_in, gate = jnp.split(y, 2, axis=-1)
        y = gate_in * jax.nn.sigmoid(gate)
        pad = self.kernel_size // 2
        y = Conv(
            inner,
            (self.kernel_size,),
            padding=((pad, pad - (self.kernel_size + 1) % 2),),
            feature_group_count=inner,
            dtype=self.dtype,
            name="dw_conv",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="bn",
        )(y)
        y = swish(y)
        y = Conv(self.dim, (1,), dtype=self.dtype, name="pw_out")(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class ConformerBlock(nn.Module):
    """Reference: src/models/conformer.py:182-222."""

    dim: int
    dim_head: int = 16
    heads: int = 4
    ff_mult: int = 4
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 31
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    conv_dropout: float = 0.0
    max_pos_emb: int = 512
    attention_impl: str = "auto"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = nn.LayerNorm(epsilon=1e-5, name="ff1_norm")(x)
        x = x + 0.5 * FeedForward(
            self.dim, self.ff_mult, self.ff_dropout, dtype=self.dtype, name="ff1"
        )(y, train=train)

        y = nn.LayerNorm(epsilon=1e-5, name="attn_norm")(x)
        x = x + RelPosAttention(
            self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            dropout=self.attn_dropout,
            max_pos_emb=self.max_pos_emb,
            attention_impl=self.attention_impl,
            dtype=self.dtype,
            name="attn",
        )(y, train=train)

        x = x + ConformerConvModule(
            self.dim,
            expansion_factor=self.conv_expansion_factor,
            kernel_size=self.conv_kernel_size,
            dropout=self.conv_dropout,
            dtype=self.dtype,
            name="conv",
        )(x, train=train)

        y = nn.LayerNorm(epsilon=1e-5, name="ff2_norm")(x)
        x = x + 0.5 * FeedForward(
            self.dim, self.ff_mult, self.ff_dropout, dtype=self.dtype, name="ff2"
        )(y, train=train)

        return nn.LayerNorm(epsilon=1e-5, name="post_norm")(x)
