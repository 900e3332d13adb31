"""Training-step tests on the virtual 8-device CPU mesh.

Uses a small model config + short clips so the jitted GAN step
compiles quickly; validates parameter movement, loss finiteness,
PESQ-skip semantics, LR schedule, and checkpoint round-trip.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmgan_tpu.config import CMGANConfig, ModelConfig, TrainConfig
from cmgan_tpu.data.dataset import BatchLoader
from cmgan_tpu.parallel import make_mesh, shard_batch
from cmgan_tpu.train import Trainer, init_train_state, make_train_steps
from cmgan_tpu.train.state import make_lr_schedule
from cmgan_tpu.train.steps import pesq_labels_host


def tiny_cfg(batch_size=8, cut_len=4000):
    return CMGANConfig(
        model=ModelConfig(
            num_channels=16,
            num_tscb_blocks=1,
            dense_depth=2,
            attn_heads=2,
            ndf=4,
        ),
        train=dataclasses.replace(
            TrainConfig(), batch_size=batch_size, cut_len=cut_len
        ),
    )


@pytest.fixture(scope="module")
def stepped():
    """Run one G+D step on an 8-device mesh; reuse for several asserts."""
    cfg = tiny_cfg()
    assert len(jax.devices()) == 8
    mesh = make_mesh(cfg.mesh)
    g_step, d_step, test_fwd, test_disc, fused = make_train_steps(cfg, steps_per_epoch=10)
    state0 = init_train_state(cfg, seed=0, steps_per_epoch=10)

    rng = np.random.default_rng(0)
    clean = rng.standard_normal((8, 4000)).astype(np.float32) * 0.1
    noisy = (clean + rng.standard_normal((8, 4000)).astype(np.float32) * 0.05)

    from cmgan_tpu.parallel import replicate_state

    state = replicate_state(mesh, state0)
    state0 = jax.device_get(state)
    clean_d, noisy_d = shard_batch(mesh, clean, noisy)
    state, metrics, handoff = g_step(state, clean_d, noisy_d)
    scores = pesq_labels_host(clean, np.asarray(handoff["est_audio"]))
    state, disc_loss = d_step(
        state,
        handoff["clean_mag"],
        handoff["est_mag"],
        shard_batch(mesh, scores),
    )
    return cfg, state0, jax.device_get(state), metrics, float(disc_loss), scores


def test_losses_finite(stepped):
    _, _, _, metrics, disc_loss, scores = stepped
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert np.isfinite(disc_loss)
    assert np.all(scores >= 1.0)  # random-ish but valid PESQ range


def test_generator_params_move(stepped):
    _, before, after, _, _, _ = stepped
    deltas = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        before.gen_params,
        after.gen_params,
    )
    assert max(jax.tree.leaves(deltas)) > 0


def test_discriminator_params_move(stepped):
    _, before, after, _, disc_loss, _ = stepped
    assert disc_loss > 0
    deltas = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        before.disc_params,
        after.disc_params,
    )
    assert max(jax.tree.leaves(deltas)) > 0


def test_step_counter(stepped):
    _, _, after, _, _, _ = stepped
    assert int(after.step) == 1


def test_disc_skip_on_bad_pesq():
    cfg = tiny_cfg(batch_size=8)
    mesh = make_mesh(cfg.mesh)
    _, d_step, *_ = make_train_steps(cfg, steps_per_epoch=10)
    state = init_train_state(cfg, seed=0, steps_per_epoch=10)
    from cmgan_tpu.parallel import replicate_state

    state = replicate_state(mesh, state)
    before = jax.device_get(state)
    frames = cfg.dsp.num_frames(cfg.train.cut_len)
    mag = jnp.abs(
        jax.random.normal(jax.random.key(0), (8, frames, cfg.dsp.num_freqs))
    )
    mag_d = shard_batch(mesh, np.asarray(mag))
    scores = shard_batch(
        mesh, np.array([2.0, 3.0, -1.0, 2.5, 2.0, 2.0, 2.0, 2.0], np.float32)
    )
    state, disc_loss = d_step(state, mag_d, mag_d, scores)
    after = jax.device_get(state)
    assert float(disc_loss) == 0.0
    deltas = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        before.disc_params,
        after.disc_params,
    )
    assert max(jax.tree.leaves(deltas)) == 0.0


def test_pesq_labels_host_failure_paths():
    clean = np.zeros((2, 4000), np.float32)  # silent -> failure
    est = np.random.default_rng(0).standard_normal((2, 4000)).astype(np.float32)
    scores = pesq_labels_host(clean, est)
    assert np.all(scores == -1.0)


def test_lr_schedule():
    cfg = tiny_cfg()
    sched = make_lr_schedule(cfg, steps_per_epoch=100, base_lr=5e-4)
    assert float(sched(0)) == pytest.approx(5e-4)
    assert float(sched(100 * 29)) == pytest.approx(5e-4)
    assert float(sched(100 * 30)) == pytest.approx(2.5e-4)
    assert float(sched(100 * 60)) == pytest.approx(1.25e-4)


def test_disc_lr_decays_with_global_step():
    """The D StepLR keys on the shared global step, not optax's
    applied-update count, so skipped (PESQ-invalid) batches cannot stall
    the decay (reference steps both schedulers per epoch,
    src/train.py:248-253). Adam's first update has magnitude ~= lr per
    weight, so first-update deltas at pre/post-decay steps must be ~2:1.
    """
    cfg = tiny_cfg(batch_size=8)
    mesh = make_mesh(cfg.mesh)
    steps_per_epoch = 10
    _, d_step, *_ = make_train_steps(cfg, steps_per_epoch=steps_per_epoch)
    from cmgan_tpu.parallel import replicate_state

    frames = cfg.dsp.num_frames(cfg.train.cut_len)
    mag = np.abs(
        np.random.default_rng(3).standard_normal(
            (8, frames, cfg.dsp.num_freqs)
        )
    ).astype(np.float32)
    mag_d = shard_batch(mesh, mag)
    est_d = shard_batch(mesh, mag * 0.7)
    scores = shard_batch(mesh, np.full(8, 2.5, np.float32))

    def first_update_delta(global_step):
        state = init_train_state(cfg, seed=0, steps_per_epoch=steps_per_epoch)
        # as if the G phase of this batch already ran at step global_step
        state = state.replace(step=jnp.asarray(global_step + 1, jnp.int32))
        before = jax.device_get(state.disc_params)
        state = replicate_state(mesh, state)
        state, _ = d_step(state, mag_d, est_d, scores)
        after = jax.device_get(state.disc_params)
        return np.max(
            jax.tree.leaves(
                jax.tree.map(
                    lambda a, b: float(np.max(np.abs(a - b))), before, after
                )
            )
        )

    decay_step = steps_per_epoch * cfg.train.decay_epochs
    d_pre = first_update_delta(decay_step - 1)
    d_post = first_update_delta(decay_step)
    assert d_post / d_pre == pytest.approx(0.5, rel=0.05)


def test_checkpoint_roundtrip(tmp_path, stepped):
    from cmgan_tpu.checkpoint import restore_train_state, save_train_state

    _, _, state, _, _, _ = stepped
    path = str(tmp_path / "ckpt")
    save_train_state(path, state)
    restored = restore_train_state(path, jax.tree.map(np.asarray, state))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_device_label_step():
    """One-program G+label+D step with on-device PESQ labels."""
    import dataclasses as _dc

    cfg = tiny_cfg()
    cfg = CMGANConfig(
        model=cfg.model,
        train=_dc.replace(cfg.train, pesq_label_mode="device"),
    )
    mesh = make_mesh(cfg.mesh)
    *_, fused = make_train_steps(cfg, steps_per_epoch=10)
    from cmgan_tpu.parallel import replicate_state

    state = replicate_state(mesh, init_train_state(cfg, seed=0, steps_per_epoch=10))
    before = jax.device_get(state)
    rng = np.random.default_rng(1)
    clean = rng.standard_normal((8, 4000)).astype(np.float32) * 0.1
    noisy = clean + rng.standard_normal((8, 4000)).astype(np.float32) * 0.05
    clean_d, noisy_d = shard_batch(mesh, clean, noisy)
    state, metrics, disc_loss = fused(state, clean_d, noisy_d)
    after = jax.device_get(state)
    assert np.isfinite(float(metrics["gen_loss"]))
    assert float(disc_loss) > 0  # labels valid -> D actually updated
    deltas = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        before.disc_params,
        after.disc_params,
    )
    assert max(jax.tree.leaves(deltas)) > 0


def test_trainer_test_pass_with_partial_batch(tmp_path):
    """test() must handle a final batch not divisible by the mesh size."""
    import os

    from cmgan_tpu.data import write_wav
    from cmgan_tpu.data.dataset import BatchLoader, DemandDataset
    from cmgan_tpu.train import Trainer

    root = tmp_path / "d"
    for sub in ("clean", "noisy"):
        os.makedirs(root / sub)
    r = np.random.default_rng(0)
    for i in range(5):  # 5 tracks, batch 4, 8 devices -> partial batch
        x = (r.standard_normal(4000) * 0.1).astype(np.float32)
        write_wav(str(root / "clean" / f"p{i}_1.wav"), x, 16000)
        write_wav(str(root / "noisy" / f"p{i}_1.wav"), x + 0.01, 16000)

    cfg = tiny_cfg(batch_size=8, cut_len=4000)
    ds = DemandDataset(str(root), cut_len=4000)
    loader = BatchLoader(ds, batch_size=4, shuffle=False, drop_last=False, prefetch=0)
    trainer = Trainer(cfg, loader, test_loader=loader)
    loss = trainer.test()
    assert np.isfinite(loss)


class _SizedLoader:
    """len()-only stand-in when steps are driven manually."""

    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n


def _async_batch(seed=3):
    rng = np.random.default_rng(seed)
    clean = rng.standard_normal((8, 4000)).astype(np.float32) * 0.1
    noisy = clean + rng.standard_normal((8, 4000)).astype(np.float32) * 0.05
    return clean, noisy


def test_host_async_one_step_matches_host():
    """One step + drain must equal the synchronous host mode exactly:
    same labels, same G and D updates — only WHEN the D update is
    applied differs (overlapped SURVEY §7 mode)."""
    import dataclasses as _dc

    clean, noisy = _async_batch()
    states = {}
    for mode in ("host", "host_async"):
        cfg = tiny_cfg()
        cfg = CMGANConfig(
            model=cfg.model,
            train=_dc.replace(cfg.train, pesq_label_mode=mode),
        )
        t = Trainer(cfg, _SizedLoader())
        t.train_step(clean, noisy)
        t.drain_pending_d()
        states[mode] = jax.device_get(t.state)
    for a, b in zip(
        jax.tree.leaves(states["host"]), jax.tree.leaves(states["host_async"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_host_async_defers_d_update_one_step():
    """disc params must be untouched after step 1 (its D update is
    pending) and move during step 2; the first step returns None for
    the disc loss (nothing was pending yet)."""
    import dataclasses as _dc

    cfg = tiny_cfg()
    cfg = CMGANConfig(
        model=cfg.model,
        train=_dc.replace(cfg.train, pesq_label_mode="host_async"),
    )
    t = Trainer(cfg, _SizedLoader())
    d0 = jax.device_get(t.state.disc_params)
    clean, noisy = _async_batch(seed=4)
    _, disc_loss1 = t.train_step(clean, noisy)
    assert t._pending_d is not None
    d1 = jax.device_get(t.state.disc_params)
    for a, b in zip(jax.tree.leaves(d0), jax.tree.leaves(d1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert disc_loss1 is None
    _, disc_loss2 = t.train_step(clean, noisy)
    # step-1's D update landed (its loss, computed sync-identically)
    assert float(jax.device_get(disc_loss2)) > 0.0
    d2 = jax.device_get(t.state.disc_params)
    deltas = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        d1,
        d2,
    )
    assert max(jax.tree.leaves(deltas)) > 0
    assert t.drain_pending_d() is not None  # step-2 update
    assert t._pending_d is None
    assert t.drain_pending_d() is None


def test_deferred_d_step_replays_sync_schedule():
    """d_step with an explicit at_step must reproduce the synchronous
    call bit-for-bit even when state.step has since advanced (the
    host_async deferral): same StepLR epoch, same dropout stream."""
    cfg = tiny_cfg()
    mesh = make_mesh(cfg.mesh)
    g_step, d_step, *_ = make_train_steps(cfg, steps_per_epoch=10)

    rng = np.random.default_rng(7)
    clean = rng.standard_normal((8, 4000)).astype(np.float32) * 0.1
    noisy = clean + rng.standard_normal((8, 4000)).astype(np.float32) * 0.05
    from cmgan_tpu.parallel import shard_batch as _shard

    clean_d, noisy_d = _shard(mesh, clean, noisy)
    base = jax.device_get(
        init_train_state(cfg, seed=0, steps_per_epoch=10)
    )

    def run(extra_g_advance):
        import jax.numpy as jnp

        from cmgan_tpu.parallel import replicate_state

        st = replicate_state(mesh, base)
        st, _, handoff = g_step(st, clean_d, noisy_d)
        at_step = st.step + 0
        if extra_g_advance:
            # pretend the NEXT batch's G phase already ran (host_async):
            # only the step counter matters for the schedule/dropout
            st = st.replace(step=st.step + 1)
        st, disc_loss = d_step(
            st,
            handoff["clean_mag"],
            handoff["est_mag"],
            _shard(mesh, np.full(8, 2.5, np.float32)),
            at_step if extra_g_advance else None,
        )
        return jax.device_get(st.disc_params), float(jax.device_get(disc_loss))

    sync_params, sync_loss = run(False)
    defer_params, defer_loss = run(True)
    assert sync_loss == defer_loss
    for a, b in zip(jax.tree.leaves(sync_params), jax.tree.leaves(defer_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_time_loss_domain_flag():
    """time_loss_domain='normalized' targets clean*c; 'reference' targets
    the raw clean (the reference's gain-suppressing quirk,
    src/train.py:140-141,190). Pin both against host-side recomputation."""
    from cmgan_tpu.train import init_train_state

    rng = np.random.default_rng(1)
    # scale down so c = sqrt(L/sum(noisy^2)) is large, like real speech
    clean = rng.standard_normal((2, 4000)).astype(np.float32) * 0.05
    noisy = clean + rng.standard_normal((2, 4000)).astype(np.float32) * 0.02

    losses = {}
    for domain in ("reference", "normalized"):
        cfg = tiny_cfg(batch_size=2)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, time_loss_domain=domain)
        )
        _, _, test_fwd, _, _ = make_train_steps(cfg, steps_per_epoch=10)
        state = init_train_state(cfg, seed=0, steps_per_epoch=10)
        metrics, handoff = test_fwd(state, jnp.asarray(clean), jnp.asarray(noisy))
        est = np.asarray(handoff["est_audio"])
        c = np.sqrt(clean.shape[-1] / np.sum(noisy * noisy, axis=-1, keepdims=True))
        target = clean * c if domain == "normalized" else clean
        expected = float(np.mean(np.abs(est - target)))
        got = float(metrics["loss_time"])
        assert got == pytest.approx(expected, rel=1e-4), domain
        losses[domain] = got
    # identical weights/inputs, so the two targets must give different losses
    assert losses["reference"] != pytest.approx(losses["normalized"], rel=1e-3)


def test_host_async_interleaved_drift_is_bounded():
    """host_async is an overlapped approximation: interleaved steps see
    D one step stale and disc_stats ordered differently (loop.py
    train_step docstring). Quantify 3-step interleaved drift vs 'host':
    generator parameters must stay close (relative L2 < 2%) and both
    runs must remain finite — a schedule bug (e.g. wrong StepLR epoch
    or dropped D update) shows up as orders-of-magnitude more drift."""
    from cmgan_tpu.train import Trainer

    rng = np.random.default_rng(3)
    clean = rng.standard_normal((8, 4000)).astype(np.float32) * 0.1
    noisy = clean + rng.standard_normal((8, 4000)).astype(np.float32) * 0.05

    class _Sized:
        def __len__(self):
            return 10

    states = {}
    for mode in ("host", "host_async"):
        cfg = tiny_cfg(batch_size=8)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, pesq_label_mode=mode)
        )
        t = Trainer(cfg, _Sized())
        for _ in range(3):
            t.train_step(clean, noisy)
        if mode == "host_async":
            t.drain_pending_d()
        states[mode] = jax.device_get(t.state)

    def rel_l2(a, b):
        num = sum(float(jnp.sum((x - y) ** 2)) for x, y in zip(
            jax.tree.leaves(a), jax.tree.leaves(b)))
        den = sum(float(jnp.sum(x ** 2)) for x in jax.tree.leaves(a))
        return (num / max(den, 1e-20)) ** 0.5

    g_drift = rel_l2(states["host"].gen_params, states["host_async"].gen_params)
    d_drift = rel_l2(states["host"].disc_params, states["host_async"].disc_params)
    assert int(states["host_async"].step) == int(states["host"].step) == 3
    for leaf in jax.tree.leaves(states["host_async"].gen_params):
        assert np.all(np.isfinite(leaf))
    assert g_drift < 0.02, g_drift
    assert d_drift < 0.05, d_drift
    # the deviation is real (stale-D + stats ordering), not zero:
    assert g_drift > 0.0


def test_gen_ema_tracks_param_history():
    """EMA tree == the closed-form recursion over the raw param history,
    and stays out of the TrainState (checkpoint format unchanged)."""
    d = 0.5  # large 1-d so two steps move the EMA measurably
    cfg = tiny_cfg(batch_size=8)
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, pesq_label_mode="device", gen_ema_decay=d
        ),
    )
    trainer = Trainer(cfg, _SizedLoader(10))
    p0 = jax.device_get(trainer.state.gen_params)

    history = []
    for seed in (3, 4):
        clean, noisy = _async_batch(seed)
        trainer.train_step(clean, noisy)
        history.append(jax.device_get(trainer.state.gen_params))

    # ema_t = d^t p0 + (1-d) * sum_i d^(t-1-i) p_{i+1}
    expect = p0
    for p in history:
        expect = jax.tree.map(lambda e, q: d * e + (1 - d) * q, expect, p)

    got = jax.device_get(trainer.ema_variables()["params"])
    for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(got)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7)
    # EMA lags the raw params (it still contains init mass)
    raw = history[-1]
    diff = sum(
        float(np.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(raw), jax.tree.leaves(got))
    )
    assert diff > 0.0
    # TrainState pytree unchanged: EMA is trainer-owned
    assert not hasattr(trainer.state, "ema_params")


def test_gen_ema_disabled_by_default():
    cfg = tiny_cfg(batch_size=8)
    trainer = Trainer(cfg, _SizedLoader(10))
    assert trainer.ema_params is None
    with pytest.raises(ValueError):
        trainer.ema_variables()


def test_restore_checkpoint_restores_ema(tmp_path):
    """Trainer.restore_checkpoint must restore the EMA tree from the
    sibling <path>_ema variables when present — not leave it tracking
    the stale pre-restore init (round-3 advisor finding) — and re-seed
    it from the restored raw weights when absent."""
    import os

    from cmgan_tpu.checkpoint import save_train_state, save_variables

    cfg = tiny_cfg(batch_size=8, cut_len=2000)
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, pesq_label_mode="device", gen_ema_decay=0.5
        ),
    )

    class _Sized:
        def __len__(self):
            return 10

    rng = np.random.default_rng(0)
    clean = rng.standard_normal((8, 2000)).astype(np.float32) * 0.1
    noisy = clean + rng.standard_normal((8, 2000)).astype(np.float32) * 0.03

    t1 = Trainer(cfg, _Sized())
    t1.train_step(clean, noisy)
    t1.train_step(clean, noisy)
    ema_saved = jax.device_get(t1.ema_params)
    raw_saved = jax.device_get(t1.state.gen_params)
    path = str(tmp_path / "ck")
    save_train_state(path, t1.state)
    save_variables(path + "_ema", jax.device_get(t1.ema_variables()))

    # EMA lags raw after two d=0.5 steps (it still holds init mass), so
    # the two trees are distinguishable
    assert any(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) > 1e-6
        for a, b in zip(jax.tree.leaves(ema_saved), jax.tree.leaves(raw_saved))
    )

    t2 = Trainer(cfg, _Sized())
    t2.restore_checkpoint(path)
    for a, b in zip(
        jax.tree.leaves(ema_saved), jax.tree.leaves(jax.device_get(t2.ema_params))
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # no sibling _ema dir: re-seed from the restored raw weights
    path2 = str(tmp_path / "ck2")
    save_train_state(path2, t1.state)
    assert not os.path.isdir(path2 + "_ema")
    t3 = Trainer(cfg, _Sized())
    t3.restore_checkpoint(path2)
    for a, b in zip(
        jax.tree.leaves(raw_saved), jax.tree.leaves(jax.device_get(t3.ema_params))
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loss_region_frames_math():
    from cmgan_tpu.train.steps import loss_region_frames

    cfg = tiny_cfg(cut_len=4000)
    assert loss_region_frames(cfg) is None
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, loss_region=(2000, 4000))
    )
    # hop 100: first frame centered at/after 2000 is 20; frames with
    # centers < 4000 end at 39 -> slice [20, 40)
    assert loss_region_frames(cfg) == (2000, 4000, 20, 40)
    bad = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, loss_region=(0, 5000))
    )
    with pytest.raises(ValueError):
        loss_region_frames(bad)


def test_loss_region_equals_manual_slice():
    """With loss_region set, the RI/mag/time parts must equal the same
    losses computed on manually sliced tensors, and the GAN term must
    stay whole-window (streaming fine-tune recipe, QUALITY_r04 §5)."""
    from cmgan_tpu.models import MetricDiscriminator, TSCNet
    from cmgan_tpu.train.steps import (
        _generator_forward,
        _generator_loss,
        loss_region_frames,
    )

    cfg = tiny_cfg(batch_size=2, cut_len=4000)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, loss_region=(2000, 4000))
    )
    region = loss_region_frames(cfg)
    s0, s1, f0, f1 = region

    state = init_train_state(cfg, seed=0, steps_per_epoch=10)
    gen = TSCNet(cfg.model)
    disc = MetricDiscriminator(cfg.model)
    gvars = {"params": state.gen_params, "batch_stats": state.gen_stats}
    dvars = {"params": state.disc_params, "batch_stats": state.disc_stats}

    rng = np.random.default_rng(1)
    clean = rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
    noisy = clean + rng.standard_normal((2, 4000)).astype(np.float32) * 0.05
    out = _generator_forward(gen, gvars, jnp.asarray(clean),
                             jnp.asarray(noisy), cfg, train=False)
    target = out["clean_audio_n"]
    weights = cfg.train.loss_weights

    _, _, parts_r, _ = _generator_loss(
        disc, dvars, out, target, weights, region=region
    )
    sliced = dict(out)
    for k in ("est_mag", "clean_mag", "est_real", "clean_real",
              "est_imag", "clean_imag"):
        sliced[k] = out[k][:, f0:f1]
    sliced["est_audio"] = out["est_audio"][:, s0:s1]
    _, _, parts_m, _ = _generator_loss(
        disc, dvars, sliced, target[:, s0:s1], weights
    )
    for k in ("loss_mag", "loss_ri", "loss_time"):
        np.testing.assert_allclose(
            float(parts_r[k]), float(parts_m[k]), rtol=1e-6, err_msg=k
        )
    # GAN term: whole-window D score regardless of the region
    _, _, parts_full, _ = _generator_loss(disc, dvars, out, target, weights)
    np.testing.assert_allclose(
        float(parts_r["loss_gan"]), float(parts_full["loss_gan"]), rtol=1e-6
    )
    # and the region genuinely changes the supervised parts
    assert abs(float(parts_r["loss_mag"]) - float(parts_full["loss_mag"])) > 0


def test_loss_region_train_step_runs():
    """Fused G+label+D step with loss_region: finite losses, params move."""
    cfg = tiny_cfg(batch_size=8, cut_len=4000)
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, loss_region=(2500, 4000), pesq_label_mode="device"
        ),
    )
    mesh = make_mesh(cfg.mesh)
    _, _, _, _, fused = make_train_steps(cfg, steps_per_epoch=10)
    state = init_train_state(cfg, seed=0, steps_per_epoch=10)

    from cmgan_tpu.parallel import replicate_state

    state = replicate_state(mesh, state)
    before = jax.device_get(state.gen_params)
    rng = np.random.default_rng(2)
    clean = rng.standard_normal((8, 4000)).astype(np.float32) * 0.1
    noisy = clean + rng.standard_normal((8, 4000)).astype(np.float32) * 0.05
    clean_d, noisy_d = shard_batch(mesh, clean, noisy)
    state, metrics, disc_loss = fused(state, clean_d, noisy_d)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert np.isfinite(float(disc_loss))
    after = jax.device_get(state.gen_params)
    moved = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        before, after,
    )
    assert max(jax.tree.leaves(moved)) > 0.0
