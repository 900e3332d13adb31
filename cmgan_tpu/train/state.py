"""GAN train state and optimizer construction.

Unlike the reference (which checkpoints only the generator's
state_dict, src/train.py:265-273, and cannot resume), the full state —
both models' params and mutable stats, both AdamW states, step counter
and PRNG key — is one pytree, checkpointable and restorable.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from cmgan_tpu.config import CMGANConfig
from cmgan_tpu.models import MetricDiscriminator, TSCNet


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    gen_params: Any
    gen_stats: Any  # BatchNorm running stats
    disc_params: Any
    disc_stats: Any  # spectral-norm u/v vectors
    gen_opt: Any
    disc_opt: Any
    rng: jax.Array  # raw PRNG key data (uint32) — serializable


def make_lr_schedule(cfg: CMGANConfig, steps_per_epoch: int, base_lr: float):
    """StepLR x0.5 every decay_epochs epochs (reference: src/train.py:248-253)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (cfg.train.lr_gamma ** (epoch // cfg.train.decay_epochs))

    return schedule


def make_optimizers(cfg: CMGANConfig, steps_per_epoch: int):
    """AdamW pair with torch-default hyperparameters (wd=0.01).

    The generator's schedule can ride optax's internal update count (it
    advances every step, so count == global step). The discriminator's
    update is SKIPPED on PESQ-invalid batches (lax.cond in steps.py), so
    its optax count falls behind the global step and an internal schedule
    would decay late vs the reference's epoch-keyed StepLR
    (src/train.py:248-253). It therefore runs at unit LR and the d-step
    scales its updates by ``make_disc_lr_schedule(...)`` on the shared
    global step. optax.adamw applies weight decay before the LR scale, so
    the external scale is exactly equivalent.
    """
    gen_tx = optax.adamw(
        make_lr_schedule(cfg, steps_per_epoch, cfg.train.init_lr),
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=0.01,
    )
    disc_tx = optax.adamw(
        1.0,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=0.01,
    )
    return gen_tx, disc_tx


def make_disc_lr_schedule(cfg: CMGANConfig, steps_per_epoch: int):
    """Discriminator StepLR on the shared global step (see make_optimizers)."""
    return make_lr_schedule(
        cfg, steps_per_epoch, cfg.train.disc_lr_mult * cfg.train.init_lr
    )


def init_train_state(
    cfg: CMGANConfig, seed: int, steps_per_epoch: int, dtype=None
) -> TrainState:
    gen = TSCNet(cfg.model, dtype=dtype)
    disc = MetricDiscriminator(cfg.model, dtype=dtype)

    key = jax.random.key(seed)
    k_gen, k_disc, k_state = jax.random.split(key, 3)

    frames = cfg.dsp.num_frames(cfg.train.cut_len)
    spec = jnp.zeros((1, frames, cfg.dsp.num_freqs, 2))
    mag = jnp.zeros((1, frames, cfg.dsp.num_freqs))

    # Initialize on the host CPU backend as one jitted program per
    # model: un-jitted flax init dispatches hundreds of tiny eager ops,
    # each a round trip through the remote-dispatch tunnel on this rig
    # (measured ~20 min of a quality run's startup). The values are
    # replicated onto the mesh (or overwritten by a checkpoint restore)
    # by the caller, so where they are computed is irrelevant. Seq-
    # sharded configs keep the ambient-mesh path (shard_map must trace
    # against the real mesh devices).
    import contextlib

    ctx = contextlib.nullcontext()
    if cfg.model.attention_impl != "seq":
        try:
            ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
        except RuntimeError:
            pass
    with ctx:
        gen_vars = jax.jit(gen.init)({"params": k_gen}, spec)
        disc_vars = jax.jit(disc.init)({"params": k_disc}, mag, mag)

    gen_tx, disc_tx = make_optimizers(cfg, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_vars["params"],
        gen_stats=gen_vars["batch_stats"],
        disc_params=disc_vars["params"],
        disc_stats=disc_vars["batch_stats"],
        gen_opt=gen_tx.init(gen_vars["params"]),
        disc_opt=disc_tx.init(disc_vars["params"]),
        rng=jax.random.key_data(k_state),
    )
