"""Sequence-parallel (time-axis sharded) rel-pos attention.

For long-form configs (BASELINE config 5: 48 kHz / long windows) the
time-conformer's context no longer fits one chip's HBM/compute budget.
This op shards the TIME axis of q/k/v across the `seq` mesh axis and
runs blockwise attention with the fused flash kernel:

  - each shard holds a contiguous block of queries [G, T/n, D];
  - k/v blocks are all-gathered over the `seq` axis (ICI ring — k/v at
    D=16 are tiny compared to attention intermediates, so the gather is
    cheap: 2*G*T*D elements vs the O(T^2/n) logits each shard computes);
  - the flash kernel runs with a per-shard query offset
    (`flash_rel_attention_at`), so Shaw relative positions use GLOBAL
    distances — numerics are identical to the unsharded kernel;
  - gradients flow through jax.shard_map: the all_gather transposes to
    a psum_scatter for dk/dv, and the replicated rel table's gradient
    is psummed automatically.

The freq-conformer (<=201 tokens) never needs this (SURVEY §5).

Reference capability being scaled: src/models/conformer.py:103-111
(single-GPU full attention; the reference has no sequence parallelism).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from cmgan_tpu.ops.flash_attention import _round_up, flash_rel_attention_at

_BLOCK = 128  # kernel q-block; Tk must be padded to a multiple of this


def seq_rel_attention(
    q, k, v, rel_table, max_pos: int, mesh=None, seq_axis: str = "seq",
    batch_axis: str | None = None,
):
    """Time-sharded attention: q, k, v [G, T, D] (T replicated-in, sharded
    compute), output [G, T, D].

    Inputs may be unsharded host-side arrays or arrays already sharded
    over `seq_axis`; shard_map's in_specs re-shard as needed. T is
    padded so every shard's local block is a multiple of the kernel
    block and shards divide evenly.

    mesh=None uses the ambient mesh (`jax.sharding.set_mesh(...)` around
    the jit/apply). batch_axis names the mesh axis the G (batch*heads)
    dimension is sharded over, if any — pass it when composing with data
    parallelism so shard_map doesn't gather the batch.
    """
    G, T, D = q.shape
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
        if seq_axis not in mesh.axis_names:
            raise ValueError(
                f"no ambient mesh with a {seq_axis!r} axis; wrap the call "
                "in jax.sharding.set_mesh(mesh) or pass mesh explicitly"
            )
    n = mesh.shape[seq_axis]
    t_loc = _round_up(-(-T // n), _BLOCK)
    t_pad = t_loc * n
    pad = [(0, 0), (0, t_pad - T), (0, 0)]
    q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    def local(q_loc, k_loc, v_loc, table):
        k_full = jax.lax.all_gather(k_loc, seq_axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_loc, seq_axis, axis=1, tiled=True)
        off = (jax.lax.axis_index(seq_axis) * t_loc).astype(jnp.float32)
        return flash_rel_attention_at(
            q_loc, k_full, v_full, table, max_pos, T, off
        )

    b_ax = batch_axis if (batch_axis and batch_axis in mesh.axis_names) else None
    spec = P(b_ax, seq_axis, None)
    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=spec,
        # pallas_call out_shapes carry no vma annotations; skip the check
        check_vma=False,
    )(q, k, v, rel_table)
    return out[:, :T, :]
