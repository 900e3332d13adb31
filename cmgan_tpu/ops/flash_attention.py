"""Fused attention kernel with Shaw relative positions (Pallas/TPU).

The conformer's attention adds a data-dependent relative-position term
  pos[i, j] = q_i . E[clip(i - j, ±max_pos) + max_pos]
to the content logits (reference: src/models/conformer.py:103-111). As
plain XLA this einsum materializes a [G, T, T(, D)] intermediate —
~10 GB for a 16x2 s batch — and dominates both HBM traffic and wall
clock. This kernel keeps everything in VMEM.

Per (group g, q-block):
  1. logits = q_blk @ K^T                  (MXU, [bq, t_pad] in VMEM)
  2. U = q_blk @ revband^T, where revband is the REVERSED band of the
     2*t_pad-1 possible relative embeddings
     (revband[c] = E[clip((t_pad-1-c) , ±max_pos) + max_pos]).
     Then pos[a, j] = U[a, (t_pad-1-i0) + j - a]: extracted with one
     dynamic slice plus a log2(bq)-step row shear (row a rolled right
     by a) — no gathers.
  3. padded-key masking, f32 row softmax, @ V.

K/V for a group stay in VMEM across consecutive q-blocks (the Pallas
pipeline skips re-fetch when the block index is unchanged), so HBM
traffic is O(T*D) per group instead of O(T^2).

The backward pass is a second Pallas kernel (`_flash_bwd_kernel`):
attn is recomputed in VMEM per (group, q-block); dk/dv accumulate
across q-block revisits of transposed [D, T] output blocks; the
rel-pos gradients reuse the shear machinery in reverse (un-shear of
the padded dS), with the band gradient accumulated into one [D, 2T]
block and segment-summed back onto the embedding table. O(T) memory in
both directions — 30 s contexts train where dense attention OOMs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def make_rel_band(rel_table, t: int, max_pos: int):
    """band[s] = table[clip(s - (t-1), ±max_pos) + max_pos], s in [0, 2t-1).

    This is the dense-XLA-facing band (unreversed), used by
    `reference_attention` and tests.
    """
    s = np.arange(2 * t - 1) - (t - 1)
    idx = np.clip(s, -max_pos, max_pos) + max_pos
    return rel_table[idx]


def reference_attention(q, k, v, rel_band, t_valid: int):
    """XLA reference: q,k,v [G, T, D], rel_band [2T-1, D]. -> [G, T, D]."""
    T = q.shape[1]
    logits = jnp.einsum("gid,gjd->gij", q, k)
    dist = np.arange(T)[:, None] - np.arange(T)[None, :] + T - 1  # [T, T]
    rel = rel_band[dist]  # [T, T, D]
    logits = logits + jnp.einsum("gid,ijd->gij", q, rel)
    if t_valid < T:
        mask = np.arange(T)[None, None, :] < t_valid
        logits = jnp.where(mask, logits, -jnp.inf)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("gij,gjd->gid", attn, v)


def _shear_rows(x, block_q: int, row_axis: int | None = None):
    """out[..., a, c] = x[..., a, (c - a) mod width] — log-step shear.

    Works on [rows, width] or batched [g, rows, width] tiles; `row_axis`
    defaults to the second-to-last axis.
    """
    row_axis = x.ndim - 2 if row_axis is None else row_axis
    a_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, row_axis)
    shift = 1
    while shift < block_q:
        rolled = pltpu.roll(x, shift=shift, axis=x.ndim - 1)
        x = jnp.where((a_ids & shift) != 0, rolled, x)
        shift *= 2
    return x


def _flash_kernel(
    qoff_ref, q_ref, k_ref, v_ref, revband_ref, out_ref, u_scratch,
    *, block_q: int, block_g: int, t_pad: int, t_valid: int
):
    # i0 is the GLOBAL index of this q-block's first query: grid offset
    # plus the caller-supplied base offset (nonzero under seq-axis
    # sharding, where each shard holds a contiguous slice of queries
    # against the full gathered key/value range). t_pad refers to the
    # padded KEY length.
    qb = pl.program_id(1)
    i0 = qoff_ref[0] + qb * block_q
    # q_offset is a multiple of block_q by caller contract (the seq
    # wrapper pads shards to the kernel block), so Mosaic may assume the
    # dynamic slice below is lane-aligned.
    start = pl.multiple_of(t_pad - i0 - block_q, block_q)

    # Whole group tile in one batched body (no per-group scalar loop):
    # block_g independent attention problems issue as batched MXU ops,
    # which Mosaic pipelines far better than a fori_loop of tiny matmuls.
    # k/v arrive TRANSPOSED ([D, T] layouts) so the large dimension sits
    # on VMEM lanes — D=16 on lanes would pad 8x.
    q = q_ref[...]  # [block_g, block_q, D]
    k = k_ref[...]  # [block_g, D, t_pad]
    v = v_ref[...]  # [block_g, D, t_pad]

    logits = jax.lax.dot_general(
        q, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [block_g, block_q, t_pad]

    # --- relative-position term ---
    # revband is SHARED across groups: fold groups into M for one large
    # [block_g*block_q, D] @ [D, 2*t_pad] MXU matmul (M large, K=D).
    u_scratch[...] = jax.lax.dot_general(
        q.reshape(block_g * block_q, q.shape[-1]), revband_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(block_g, block_q, 2 * t_pad)
    # pos[g, a, j] = U[g, a, (t_pad-1-i0) + j - a]
    # slice W[g, a, c] = U[g, a, c + t_pad - i0 - block_q]
    # (ref slicing: Mosaic lowers dynamic starts on refs, not on values)
    w = u_scratch[:, :, pl.ds(start, t_pad + block_q)]
    # shear: V3[g, a, c] = W[g, a, c - a] => pos[g, a, j] = V3[g, a, j + block_q - 1]
    v3 = _shear_rows(w, block_q)
    pos = jax.lax.slice(
        v3, (0, 0, block_q - 1), (block_g, block_q, block_q - 1 + t_pad)
    )
    logits = logits + pos

    # mask padded keys; f32 row softmax (T fully resident)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
    logits = jnp.where(j_ids < t_valid, logits, -jnp.inf)
    m = jnp.max(logits, axis=2, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=2, keepdims=True)
    attn = (p / denom).astype(v.dtype)

    out_ref[...] = jax.lax.dot_general(
        attn, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _flash_forward(
    q, k, v, rel_table, max_pos: int, block_q: int = 128,
    block_g: int | None = None, q_offset=None, t_valid: int | None = None,
):
    """q: [G, Tq, D]; k, v: [G, Tk, D]. q_offset (traced or static int)
    is the global position of q's first row — nonzero under seq-axis
    sharding, where the caller must pre-pad so that Tk is a multiple of
    block_q and q_offset + Tq <= Tk (see ops/seq_attention.py). t_valid
    masks keys beyond the true (pre-padding) length; defaults to Tk."""
    G, Tq, D = q.shape
    Tk = k.shape[1]
    t_pad = _round_up(Tk, block_q)
    tq_pad = _round_up(Tq, block_q)
    if q_offset is None:
        q_offset = 0
    t_valid = Tk if t_valid is None else min(t_valid, Tk)

    if block_g is None:
        # VMEM budget for the batched body: ~7 live [block_q, t_pad]-class
        # f32 temporaries per group (logits, U(2x), shear copies, exp),
        # plus double-buffered k/v ([D, t_pad]) and q/out tiles.
        budget = 10 * 1024 * 1024
        per_group = (
            7 * block_q * t_pad * 4
            + 2 * (2 * D * t_pad * 4)
            + 2 * 2 * block_q * _LANES * 4
        )
        fixed = D * 2 * t_pad * 4
        # cap 8: measured fastest at parity scale (bg=16 exceeds VMEM)
        block_g = int(max(1, min(8, (budget - fixed) // per_group)))

    # reversed band over padded positions:
    # revband[c] = E[clip(t_pad - 1 - c, ±max_pos) + max_pos], c in [0, 2*t_pad)
    s = (t_pad - 1) - np.arange(2 * t_pad)
    idx = np.clip(s, -max_pos, max_pos) + max_pos
    revband = jnp.transpose(rel_table[idx])  # [D, 2*t_pad]

    g_pad = _round_up(G, block_g)
    qp = jnp.pad(q, [(0, g_pad - G), (0, tq_pad - Tq), (0, 0)])
    # k/v transposed so the time axis is on VMEM lanes
    kp = jnp.pad(jnp.transpose(k, (0, 2, 1)), [(0, g_pad - G), (0, 0), (0, t_pad - Tk)])
    vp = jnp.pad(jnp.transpose(v, (0, 2, 1)), [(0, g_pad - G), (0, 0), (0, t_pad - Tk)])
    qoff = jnp.asarray(q_offset, jnp.int32).reshape(1)

    grid = (g_pad // block_g, tq_pad // block_q)
    # interpreter mode on non-TPU backends (tests run on CPU)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            block_q=block_q, block_g=block_g, t_pad=t_pad, t_valid=t_valid,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (block_g, block_q, D), lambda g, qb: (g, qb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_g, D, t_pad), lambda g, qb: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_g, D, t_pad), lambda g, qb: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (D, 2 * t_pad), lambda g, qb: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_g, block_q, D), lambda g, qb: (g, qb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((g_pad, tq_pad, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_g, block_q, 2 * t_pad), jnp.float32)
        ],
        interpret=interpret,
    )(qoff, qp, kp, vp, revband)
    return out[:G, :Tq, :]


def _unshear_rows(x, block_q: int):
    """Inverse of `_shear_rows`: out[a, c] = x[a, (c + a) mod width]."""
    width = x.shape[1]
    a_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < block_q:
        rolled = pltpu.roll(x, shift=width - shift, axis=1)
        x = jnp.where((a_ids & shift) != 0, rolled, x)
        shift *= 2
    return x


def _flash_bwd_kernel(
    qoff_ref, q_ref, k_ref, v_ref, revband_ref, g_ref,
    dq_ref, dk_ref, dv_ref, dband_ref,
    u_scratch, ds_scratch,
    *, block_q: int, block_g: int, t_pad: int, t_valid: int,
):
    qb = pl.program_id(1)
    i0 = qoff_ref[0] + qb * block_q
    start = pl.multiple_of(t_pad - i0 - block_q, block_q)
    first_step = qb == 0

    @pl.when(first_step)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    @pl.when(first_step & (pl.program_id(0) == 0))
    def _():
        dband_ref[...] = jnp.zeros_like(dband_ref)

    def body(g, _):
        q = q_ref[g]        # [block_q, D]
        k = k_ref[g]        # [D, t_pad]
        v = v_ref[g]        # [D, t_pad]
        gout = g_ref[g]     # [block_q, D]

        # --- recompute attn (same as forward) ---
        logits = jax.lax.dot_general(
            q, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        u_scratch[:] = jax.lax.dot_general(
            q, revband_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        w = u_scratch[:, pl.ds(start, t_pad + block_q)]
        v3 = _shear_rows(w, block_q)
        pos = jax.lax.slice(v3, (0, block_q - 1), (block_q, block_q - 1 + t_pad))
        logits = logits + pos
        j_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(j_ids < t_valid, logits, -jnp.inf)
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        attn = p / jnp.sum(p, axis=1, keepdims=True)  # [block_q, t_pad]

        # --- gradients ---
        # dv^T[d, j] += sum_a attn[a, j] g[a, d]
        dv_ref[g] += jax.lax.dot_general(
            gout, attn, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)

        # dp[a, j] = g[a] . v[:, j]; ds = attn * (dp - rowsum(attn*dp))
        dp = jax.lax.dot_general(
            gout, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jnp.where(j_ids < t_valid, dp, 0.0)
        ds = attn * (dp - jnp.sum(attn * dp, axis=1, keepdims=True))
        ds = jnp.where(j_ids < t_valid, ds, 0.0)  # [block_q, t_pad]

        # dq from content term: ds @ k^T
        dq = jax.lax.dot_general(
            ds, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

        # dk^T[d, j] += sum_a ds[a, j] q[a, d]
        dk_ref[g] += jax.lax.dot_general(
            q, ds, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)

        # --- rel-pos gradients via the inverse shear ---
        # forward: pos[a, j] = W[a, j + block_q - 1 - a],
        #          W[a, c] = U[a, c + start], U = q @ revband
        # => dW[a, c] = ds[a, c + a - (block_q - 1)]: pad ds left by
        # block_q-1 (extra right margin so no wrap) and un-shear.
        ds_scratch[...] = jnp.pad(
            ds, ((0, 0), (block_q - 1, block_q + 1))
        )  # [block_q, t_pad + 2*block_q]
        dw = _unshear_rows(ds_scratch[...], block_q)
        dw = jax.lax.slice(dw, (0, 0), (block_q, t_pad + block_q))

        # dq from pos term: dq[a, d] += sum_c dW[a, c] revband[d, c+start]
        band_slice = revband_ref[:, pl.ds(start, t_pad + block_q)]  # [D, w]
        dq = dq + jax.lax.dot_general(
            dw, band_slice, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[g] = dq.astype(dq_ref.dtype)

        # dband[d, c+start] += sum_a q[a, d] dW[a, c]
        dband_ref[:, pl.ds(start, t_pad + block_q)] += jax.lax.dot_general(
            q, dw, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dband_ref.dtype)
        return 0

    jax.lax.fori_loop(0, block_g, body, 0)


def _flash_backward(q, k, v, rel_table, max_pos: int, g,
                    block_q: int = 128, block_g: int | None = None,
                    q_offset=None, t_valid: int | None = None):
    G, Tq, D = q.shape
    Tk = k.shape[1]
    t_pad = _round_up(Tk, block_q)
    tq_pad = _round_up(Tq, block_q)
    if q_offset is None:
        q_offset = 0
    t_valid = Tk if t_valid is None else min(t_valid, Tk)

    if block_g is None:
        budget = 9 * 1024 * 1024
        per_group = 4 * (2 * D * t_pad * 4) + 4 * 2 * block_q * _LANES * 4
        fixed = (
            block_q * 2 * t_pad * 4
            + block_q * (t_pad + 2 * block_q) * 4
            + (D * 2 * t_pad * 4) * 2
            + 10 * block_q * t_pad * 4
        )
        block_g = int(max(1, min(8, (budget - fixed) // per_group)))

    s = (t_pad - 1) - np.arange(2 * t_pad)
    idx = np.clip(s, -max_pos, max_pos) + max_pos
    revband = jnp.transpose(rel_table[idx])  # [D, 2*t_pad]

    g_pad = _round_up(G, block_g)
    pad3 = [(0, g_pad - G), (0, tq_pad - Tq), (0, 0)]
    qp = jnp.pad(q, pad3)
    gp = jnp.pad(g, pad3)
    kp = jnp.pad(jnp.transpose(k, (0, 2, 1)), [(0, g_pad - G), (0, 0), (0, t_pad - Tk)])
    vp = jnp.pad(jnp.transpose(v, (0, 2, 1)), [(0, g_pad - G), (0, 0), (0, t_pad - Tk)])
    qoff = jnp.asarray(q_offset, jnp.int32).reshape(1)

    grid = (g_pad // block_g, tq_pad // block_q)
    interpret = jax.default_backend() != "tpu"
    group_spec = pl.BlockSpec(
        (block_g, block_q, D), lambda gi, qb: (gi, qb, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (block_g, D, t_pad), lambda gi, qb: (gi, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk_t, dv_t, dband = pl.pallas_call(
        functools.partial(
            _flash_bwd_kernel,
            block_q=block_q, block_g=block_g, t_pad=t_pad, t_valid=t_valid,
        ),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  group_spec, kv_spec, kv_spec,
                  pl.BlockSpec((D, 2 * t_pad), lambda gi, qb: (0, 0),
                               memory_space=pltpu.VMEM),
                  group_spec],
        out_specs=(
            group_spec,  # dq
            kv_spec,     # dk (transposed layout)
            kv_spec,     # dv
            pl.BlockSpec((D, 2 * t_pad), lambda gi, qb: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g_pad, tq_pad, D), q.dtype),
            jax.ShapeDtypeStruct((g_pad, D, t_pad), q.dtype),
            jax.ShapeDtypeStruct((g_pad, D, t_pad), q.dtype),
            jax.ShapeDtypeStruct((D, 2 * t_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 2 * t_pad), jnp.float32),
            pltpu.VMEM((block_q, t_pad + 2 * block_q), jnp.float32),
        ],
        interpret=interpret,
    )(qoff, qp, kp, vp, revband, gp)

    dq = dq[:G, :Tq]
    dk = jnp.transpose(dk_t, (0, 2, 1))[:G, :Tk]
    dv = jnp.transpose(dv_t, (0, 2, 1))[:G, :Tk]
    # scatter band gradient back onto the embedding table rows
    # (dband is [D, 2*t_pad] in REVERSED band coordinates)
    dband = jnp.transpose(dband)  # [2*t_pad, D]
    dtable = jax.ops.segment_sum(dband, idx, num_segments=rel_table.shape[0])
    return dq, dk, dv, dtable.astype(rel_table.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_rel_attention_at(q, k, v, rel_table, max_pos: int, t_valid, q_offset):
    """Fused attention with Shaw relative positions at a query offset.

    q: [G, Tq, D]; k, v: [G, Tk, D]; rel_table: [2*max_pos+1, D].
    q_offset (float32 scalar, possibly traced — e.g. derived from
    `jax.lax.axis_index` under seq-axis sharding) is the global position
    of q's first row within the key range. Caller contract when
    q_offset != 0: Tk is a multiple of the kernel block (128) and
    q_offset + Tq <= Tk (ops/seq_attention.py pads accordingly).
    Forward and backward both run as Pallas kernels (O(T) memory).
    """
    return _flash_forward(
        q, k, v, rel_table, max_pos, q_offset=q_offset, t_valid=t_valid
    )


def _fwd_at(q, k, v, rel_table, max_pos, t_valid, q_offset):
    out = _flash_forward(
        q, k, v, rel_table, max_pos, q_offset=q_offset, t_valid=t_valid
    )
    return out, (q, k, v, rel_table, q_offset)


def _bwd_at(max_pos, t_valid, res, g):
    q, k, v, rel_table, q_offset = res
    dq, dk, dv, dtable = _flash_backward(
        q, k, v, rel_table, max_pos, g, q_offset=q_offset, t_valid=t_valid
    )
    return dq, dk, dv, dtable, jnp.zeros((), jnp.float32)


flash_rel_attention_at.defvjp(_fwd_at, _bwd_at)


def flash_rel_attention(q, k, v, rel_table, max_pos: int):
    """Fused attention with Shaw relative positions (q and k/v aligned).

    q, k, v: [G, T, D] (G = batch*heads groups); rel_table:
    [2*max_pos+1, D] embedding table. Equivalent to
    `reference_attention(q, k, v, make_rel_band(rel_table, T, max_pos), T)`.
    """
    return flash_rel_attention_at(
        q, k, v, rel_table, max_pos, None, jnp.zeros((), jnp.float32)
    )
