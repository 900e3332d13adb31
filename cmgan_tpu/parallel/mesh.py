"""Device mesh + sharding helpers for SPMD data-parallel training.

The reference's distributed runtime is one-process-per-GPU DDP over
NCCL (src/train.py:34-42,68-69,294-297). Here a single process drives
all local devices through GSPMD: batches are sharded over the `data`
mesh axis, parameters are replicated, and XLA inserts the gradient
all-reduces (over ICI on a real slice). Multi-host extends this via
jax.distributed.initialize + per-process data sharding (data/dataset.py).

A second `seq` axis is reserved for long-form time-axis sharding
(48 kHz / long-context configs).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmgan_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices: Sequence | None = None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // max(cfg.seq_parallel, 1)
    sp = max(cfg.seq_parallel, 1)
    assert dp * sp == n, f"mesh {dp}x{sp} != {n} devices"
    dev_array = np.asarray(devices).reshape(dp, sp)
    return Mesh(dev_array, (cfg.data_axis, cfg.seq_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over `data`."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with the batch axis sharded over `data`."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_state(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
