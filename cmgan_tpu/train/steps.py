"""Jitted GAN train/test steps.

One optimization step is two XLA programs bridged by the host PESQ
labeler (the only host round-trip, matching the reference's synchronous
CPU labeling, src/train.py:176-205):

  phase G (device): RMS-norm -> STFT -> compress -> generator forward
    (train mode, BN stats mutable) -> losses (RI + mag + time +
    metric-GAN via the discriminator) -> grads -> AdamW update.
  host: wideband PESQ labels for (clean, est_audio) via the native
    library; any failed utterance poisons the batch (label None
    semantics of reference src/models/discriminator.py:23-24).
  phase D (device): two discriminator passes batched as one, MSE to
    (1, pesq_label) targets, grads, update — skipped entirely via
    lax.cond when the labels were invalid (reference src/train.py:198-203).

Reference quirks preserved deliberately: the time-domain L1 loss and
the PESQ labels compare the *normalized-domain* est_audio against the
*unnormalized* clean waveform (reference train.py:140-141,155-157 —
the normalization at train.py:75-79 rebinds locals only). The time-loss
side of the quirk measurably suppresses output gain (2.36x attenuation
on the round-2 checkpoint, tools/diagnose_ssnr.py); set
TrainConfig.time_loss_domain='normalized' to target clean * c instead.
The PESQ-label side is harmless (PESQ level-aligns internally) and is
always kept.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cmgan_tpu.config import CMGANConfig
from cmgan_tpu.dsp import istft, power_compress, power_uncompress, stft
from cmgan_tpu.models import MetricDiscriminator, TSCNet
from cmgan_tpu.train.state import (
    TrainState,
    make_disc_lr_schedule,
    make_optimizers,
)


def pesq_labels_host(clean: np.ndarray, est: np.ndarray) -> np.ndarray:
    """Batch PESQ on host; -1 marks failures (silent utterances)."""
    from cmgan_tpu.metrics.pesq_native import pesq_batch

    clean = np.asarray(clean, np.float64)
    est = np.asarray(est, np.float64)
    try:
        scores = pesq_batch(clean, est)
    except Exception:
        return np.full(clean.shape[0], -1.0, np.float32)
    # degenerate (all-zero / non-finite) utterances are failures
    bad = ~np.isfinite(scores)
    energy = np.sum(clean * clean, axis=-1) * np.sum(est * est, axis=-1)
    bad |= energy <= 0.0
    return np.where(bad, -1.0, scores).astype(np.float32)


def _generator_forward(gen: TSCNet, variables, clean, noisy, cfg: CMGANConfig,
                       train: bool, dropout_rng=None):
    """Shared forward pass: returns spectra, est audio and new BN stats."""
    dsp = cfg.dsp
    length = noisy.shape[-1]
    c = jnp.sqrt(length / jnp.sum(noisy * noisy, axis=-1, keepdims=True))
    noisy_n = noisy * c
    clean_n = clean * c

    noisy_spec = power_compress(
        stft(noisy_n, dsp.n_fft, dsp.hop, dft_impl=dsp.dft_impl)
    )
    clean_spec = power_compress(
        stft(clean_n, dsp.n_fft, dsp.hop, dft_impl=dsp.dft_impl)
    )
    clean_real = clean_spec[..., 0]
    clean_imag = clean_spec[..., 1]
    clean_mag = jnp.sqrt(clean_real**2 + clean_imag**2)

    if train:
        (est_real, est_imag), updates = gen.apply(
            variables,
            noisy_spec,
            train=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        new_stats = updates["batch_stats"]
    else:
        est_real, est_imag = gen.apply(variables, noisy_spec, train=False)
        new_stats = variables["batch_stats"]

    est_mag = jnp.sqrt(est_real**2 + est_imag**2)
    est_audio = istft(
        power_uncompress(est_real, est_imag), dsp.n_fft, dsp.hop,
        dft_impl=dsp.dft_impl,
    )

    return {
        "est_real": est_real,
        "est_imag": est_imag,
        "est_mag": est_mag,
        "clean_real": clean_real,
        "clean_imag": clean_imag,
        "clean_mag": clean_mag,
        "est_audio": est_audio,
        "clean_audio_n": clean_n,
        "new_stats": new_stats,
    }


def loss_region_frames(cfg: CMGANConfig):
    """Static (s0, s1, f0, f1) for TrainConfig.loss_region, or None.

    Samples [s0, s1) of the cut_len window; STFT frames [f0, f1) are
    the frames whose centers (t * hop, center-padded STFT) fall inside
    the sample range.
    """
    if cfg.train.loss_region is None:
        return None
    s0, s1 = cfg.train.loss_region
    L, hop = cfg.train.cut_len, cfg.dsp.hop
    if not (0 <= s0 < s1 <= L):
        raise ValueError(f"loss_region {cfg.train.loss_region} outside "
                         f"[0, {L}]")
    f0 = -(-s0 // hop)
    f1 = (s1 - 1) // hop + 1
    return (s0, s1, f0, f1)


def _generator_loss(
    disc: MetricDiscriminator,
    disc_vars,
    out,
    time_target,
    weights,
    train: bool = False,
    dropout_rng=None,
    region=None,
):
    """Reference: src/train.py:124-151. In train mode the discriminator
    runs with dropout active and its SN power iteration advancing, as in
    the reference (D is in .train() mode during the G step); the updated
    u/v vectors are returned so the caller can keep them.

    Losses are reduced per example first (mean over non-batch axes) so
    eval can weight partial batches by real rows; the batch means equal
    the reference's whole-batch means exactly (equal-sized rows).

    `region` = (s0, s1, f0, f1) from loss_region_frames(): the RI /
    magnitude / time losses reduce over only samples [s0, s1) / frames
    [f0, f1) (the streaming fine-tune recipe, TrainConfig.loss_region);
    the GAN term stays whole-window.
    """
    w_ri, w_mag, w_time, w_gan = weights
    if train:
        score, disc_updates = disc.apply(
            disc_vars,
            out["clean_mag"],
            out["est_mag"],
            train=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        new_disc_stats = disc_updates["batch_stats"]
    else:
        score = disc.apply(disc_vars, out["clean_mag"], out["est_mag"], train=False)
        new_disc_stats = disc_vars["batch_stats"]

    def per_ex(x):
        return jnp.mean(x.reshape(x.shape[0], -1), axis=-1)

    if region is None:
        fsl = tsl = slice(None)
    else:
        s0, s1, f0, f1 = region
        fsl, tsl = slice(f0, f1), slice(s0, s1)

    gan_loss = (score.reshape(-1) - 1.0) ** 2
    loss_mag = per_ex((out["est_mag"][:, fsl] - out["clean_mag"][:, fsl]) ** 2)
    loss_ri = per_ex(
        (out["est_real"][:, fsl] - out["clean_real"][:, fsl]) ** 2
    ) + per_ex((out["est_imag"][:, fsl] - out["clean_imag"][:, fsl]) ** 2)
    time_loss = per_ex(
        jnp.abs(out["est_audio"][:, tsl] - time_target[:, tsl])
    )
    total = w_ri * loss_ri + w_mag * loss_mag + w_time * time_loss + w_gan * gan_loss
    parts = {
        "loss_ri": jnp.mean(loss_ri),
        "loss_mag": jnp.mean(loss_mag),
        "loss_time": jnp.mean(time_loss),
        "loss_gan": jnp.mean(gan_loss),
    }
    return jnp.mean(total), total, parts, new_disc_stats


def make_train_steps(cfg: CMGANConfig, steps_per_epoch: int, dtype=None):
    """Returns (g_step, d_step, test_fwd, test_disc_loss, fused_step)."""
    gen = TSCNet(cfg.model, dtype=dtype)
    disc = MetricDiscriminator(cfg.model, dtype=dtype)
    gen_tx, disc_tx = make_optimizers(cfg, steps_per_epoch)
    disc_lr = make_disc_lr_schedule(cfg, steps_per_epoch)
    weights = cfg.train.loss_weights
    time_norm = cfg.train.time_loss_domain == "normalized"
    region = loss_region_frames(cfg)

    def _time_target(out, clean):
        # see TrainConfig.time_loss_domain: raw clean reproduces the
        # reference's gain-suppressing quirk; clean_audio_n fixes it
        return out["clean_audio_n"] if time_norm else clean

    def _g_core(state: TrainState, clean, noisy):
        base_rng = jax.random.wrap_key_data(state.rng)
        dropout_rng = jax.random.fold_in(base_rng, state.step)
        disc_rng = jax.random.fold_in(dropout_rng, 17)

        def loss_fn(gen_params):
            out = _generator_forward(
                gen,
                {"params": gen_params, "batch_stats": state.gen_stats},
                clean,
                noisy,
                cfg,
                train=True,
                dropout_rng=dropout_rng,
            )
            disc_vars = {
                "params": state.disc_params,
                "batch_stats": state.disc_stats,
            }
            total, _, parts, disc_stats = _generator_loss(
                disc, disc_vars, out, _time_target(out, clean), weights,
                train=True, dropout_rng=disc_rng, region=region,
            )
            return total, (out, parts, disc_stats)

        (loss, (out, parts, disc_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.gen_params)
        updates, new_opt = gen_tx.update(grads, state.gen_opt, state.gen_params)
        new_params = optax.apply_updates(state.gen_params, updates)
        state = state.replace(
            step=state.step + 1,
            gen_params=new_params,
            gen_stats=out["new_stats"],
            gen_opt=new_opt,
            disc_stats=jax.lax.stop_gradient(disc_stats),
        )
        metrics = dict(parts, gen_loss=loss)
        # detached tensors for the discriminator phase + host labeling
        handoff = {
            "clean_mag": out["clean_mag"],
            "est_mag": jax.lax.stop_gradient(out["est_mag"]),
            "est_audio": jax.lax.stop_gradient(out["est_audio"]),
        }
        return state, metrics, handoff

    def _d_core(state: TrainState, clean_mag, est_mag, pesq_scores, at_step=None):
        # at_step: the value state.step had right after THIS batch's G
        # phase. Defaults to state.step (synchronous call order); the
        # host_async mode applies this update after the NEXT batch's G
        # phase has advanced state.step, and passes the stashed value so
        # the StepLR epoch and the dropout stream match the synchronous
        # schedule exactly.
        step_now = state.step if at_step is None else at_step
        valid = jnp.min(pesq_scores) >= 0.0
        labels = (pesq_scores - cfg.train.pesq_norm_offset) / cfg.train.pesq_norm_scale
        dropout_rng = jax.random.fold_in(
            jax.random.fold_in(jax.random.wrap_key_data(state.rng), step_now), 1
        )

        def loss_fn(disc_params):
            disc_vars = {"params": disc_params, "batch_stats": state.disc_stats}
            # both passes in one batched forward on the MXU
            x = jnp.concatenate([clean_mag, clean_mag], axis=0)
            y = jnp.concatenate([clean_mag, est_mag], axis=0)
            scores, updates = disc.apply(
                disc_vars,
                x,
                y,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            scores = scores.reshape(-1)
            b = clean_mag.shape[0]
            pred_max, pred_enh = scores[:b], scores[b:]
            loss = jnp.mean((pred_max - 1.0) ** 2) + jnp.mean(
                (pred_enh - labels) ** 2
            )
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.disc_params
        )

        def apply(_):
            updates, new_opt = disc_tx.update(
                grads, state.disc_opt, state.disc_params
            )
            # disc_tx runs at unit LR; scale by the epoch-keyed StepLR on
            # the shared global step (step_now is the post-G value, so
            # this batch's step is step_now - 1) so skipped batches don't
            # stall the decay (reference src/train.py:248-253 steps both
            # schedulers per epoch).
            lr = disc_lr(step_now - 1)
            updates = jax.tree.map(lambda u: u * lr, updates)
            new_params = optax.apply_updates(state.disc_params, updates)
            return new_params, new_opt, new_stats

        def skip(_):
            return state.disc_params, state.disc_opt, state.disc_stats

        new_params, new_opt, kept_stats = jax.lax.cond(valid, apply, skip, None)
        state = state.replace(
            disc_params=new_params, disc_opt=new_opt, disc_stats=kept_stats
        )
        disc_loss = jnp.where(valid, loss, 0.0)
        return state, disc_loss

    g_step = functools.partial(jax.jit, donate_argnums=(0,))(_g_core)
    d_step = functools.partial(jax.jit, donate_argnums=(0,))(_d_core)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fused_step(state: TrainState, clean, noisy):
        """G update + on-device PESQ labels + D update as ONE XLA
        program — no host round trip (requires pesq_label_mode='device').
        """
        from cmgan_tpu.metrics.pesq_jax import pesq_labels_jax

        state, metrics, handoff = _g_core(state, clean, noisy)
        scores = pesq_labels_jax(clean, handoff["est_audio"])
        state, disc_loss = _d_core(
            state, handoff["clean_mag"], handoff["est_mag"], scores
        )
        return state, metrics, disc_loss

    @jax.jit
    def test_fwd(state: TrainState, clean, noisy):
        """Eval-mode forward: returns generator loss parts + handoff.

        metrics['gen_loss_per_ex'] carries per-example totals so the
        caller can weight partial (wrap-padded) batches by real rows.
        """
        out = _generator_forward(
            gen,
            {"params": state.gen_params, "batch_stats": state.gen_stats},
            clean,
            noisy,
            cfg,
            train=False,
        )
        disc_vars = {"params": state.disc_params, "batch_stats": state.disc_stats}
        total, total_per_ex, parts, _ = _generator_loss(
            disc, disc_vars, out, _time_target(out, clean), weights,
            region=region,
        )
        metrics = dict(parts, gen_loss=total, gen_loss_per_ex=total_per_ex)
        handoff = {
            "clean_mag": out["clean_mag"],
            "est_mag": out["est_mag"],
            "est_audio": out["est_audio"],
        }
        return metrics, handoff

    @jax.jit
    def test_disc_loss(state: TrainState, clean_mag, est_mag, pesq_scores):
        """Per-example D losses [B] (0 when any PESQ label failed)."""
        valid = jnp.min(pesq_scores) >= 0.0
        labels = (pesq_scores - cfg.train.pesq_norm_offset) / cfg.train.pesq_norm_scale
        disc_vars = {"params": state.disc_params, "batch_stats": state.disc_stats}
        x = jnp.concatenate([clean_mag, clean_mag], axis=0)
        y = jnp.concatenate([clean_mag, est_mag], axis=0)
        scores = disc.apply(disc_vars, x, y, train=False).reshape(-1)
        b = clean_mag.shape[0]
        loss = (scores[:b] - 1.0) ** 2 + (scores[b:] - labels) ** 2
        return jnp.where(valid, loss, jnp.zeros_like(loss))

    return g_step, d_step, test_fwd, test_disc_loss, fused_step
