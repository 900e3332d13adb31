"""Orbax-backed checkpoint I/O.

Saves the FULL train state (both models, both optimizer states, BN/SN
statistics, step, PRNG key) so training is resumable — the reference
saves only the generator's weights and cannot resume
(src/train.py:265-273). `save_variables`/`restore_variables` handle
inference-only {params, batch_stats} trees.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _abspath(path: str) -> str:
    return os.path.abspath(path)


def save_train_state(path: str, state: Any):
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(_abspath(path), jax.device_get(state), force=True)


def restore_train_state(path: str, template: Any) -> Any:
    """Restore into the structure of `template` (an abstract or concrete
    TrainState with the right shapes/dtypes)."""
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(_abspath(path), item=template)


def save_variables(path: str, variables: Any):
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(_abspath(path), jax.device_get(variables), force=True)


def restore_variables(path: str, template: Any | None = None) -> Any:
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(_abspath(path))
        return ckptr.restore(_abspath(path), item=template)
