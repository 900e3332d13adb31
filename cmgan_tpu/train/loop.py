"""Training orchestration: the GAN epoch loop.

Mirrors the reference Trainer (src/train.py:45-275) — same loop
structure, loss weights, LR schedule, per-epoch test pass and
checkpointing — rebuilt around jitted SPMD steps. Improvements over the
reference: full-state checkpoints with resume, and an on-device PESQ
label mode (pesq_label_mode='device') that fuses the whole G+label+D
step into one XLA program with no host synchronization.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np

from cmgan_tpu.config import CMGANConfig
from cmgan_tpu.data.dataset import BatchLoader
from cmgan_tpu.parallel import make_mesh, replicate_state, shard_batch
from cmgan_tpu.train.state import TrainState, init_train_state
from cmgan_tpu.train.steps import make_train_steps, pesq_labels_host

log = logging.getLogger("cmgan_tpu.train")


class Trainer:
    def __init__(
        self,
        cfg: CMGANConfig,
        train_loader: BatchLoader,
        test_loader: Optional[BatchLoader] = None,
        dtype=None,
        mesh=None,
        state: Optional[TrainState] = None,
        metrics_path: Optional[str] = None,
    ):
        if cfg.train.pesq_label_mode not in ("host", "host_async", "device"):
            raise ValueError(
                f"pesq_label_mode must be 'host', 'host_async' or "
                f"'device', got {cfg.train.pesq_label_mode!r}"
            )
        self.cfg = cfg
        self.metrics_logger = None
        if metrics_path:
            from cmgan_tpu.utils import MetricsLogger

            self.metrics_logger = MetricsLogger(metrics_path)
        self.train_loader = train_loader
        self.test_loader = test_loader
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        steps_per_epoch = max(len(train_loader), 1)
        (
            self.g_step,
            self.d_step,
            self.test_fwd,
            self.test_disc_loss,
            self.fused_step,
        ) = make_train_steps(cfg, steps_per_epoch, dtype=dtype)
        if state is None:
            with self._mesh_ctx():
                # seq-sharded attention (attention_impl='seq') traces
                # through shard_map at init (train=False), which needs
                # the mesh ambient; data-parallel-only configs need no
                # context here
                state = init_train_state(
                    cfg, cfg.train.seed, steps_per_epoch, dtype=dtype
                )
        self.state = replicate_state(self.mesh, state)
        self.ema_params = None
        self._ema_update = None
        if cfg.train.gen_ema_decay > 0.0:
            import jax.numpy as jnp

            d = float(cfg.train.gen_ema_decay)
            # fresh buffers (not aliases): the live gen_params are donated
            # to the next step's jitted program
            self.ema_params = jax.jit(lambda t: jax.tree.map(jnp.asarray, t))(
                self.state.gen_params
            )
            self._ema_update = jax.jit(
                lambda ema, p: jax.tree.map(
                    lambda e, q: d * e + (1.0 - d) * q.astype(e.dtype), ema, p
                ),
                donate_argnums=0,
            )
        self._label_pool = None
        self._pending_d = None  # (handoff, scores_future) in host_async mode
        if cfg.train.pesq_label_mode == "host_async":
            from concurrent.futures import ThreadPoolExecutor

            # one worker keeps label batches ordered; the thread's only
            # job is the est_audio device fetch + the C++ PESQ batch, so
            # more workers would just contend for the ctypes scorer
            self._label_pool = ThreadPoolExecutor(max_workers=1)

    # ------------------------------------------------------------------
    def _mesh_ctx(self):
        """Ambient-mesh context for model tracing: required whenever the
        model's attention_impl is 'seq' (eval-mode forwards — init and
        the test pass — shard the time axis over the mesh's `seq` axis;
        train-mode forwards with dropout fall back to dense attention
        but trace inside the same context harmlessly)."""
        import contextlib

        if self.cfg.model.attention_impl == "seq":
            return jax.sharding.set_mesh(self.mesh)
        return contextlib.nullcontext()

    def train_step(self, clean: np.ndarray, noisy: np.ndarray):
        """One GAN step; returns (gen_loss, disc_loss) as DEVICE scalars
        (not fetched — callers decide when to sync).

        pesq_label_mode='host': two device programs bridged by the
        native CPU scorer (reference-faithful). 'device': one fused
        program with on-TPU labels — no host synchronization at all;
        steps are dispatched asynchronously and the loop only blocks
        when it fetches metrics at log_interval boundaries.
        'host_async': exact host labels, but scored in a background
        thread while the device executes; the D update for step t is
        applied during step t+1 (the generator sees D one step stale —
        the overlapped variant SURVEY §7 plans behind a flag; the
        reference itself is synchronous, src/train.py:176-205). The
        deferred update replays the synchronous StepLR epoch and
        dropout stream via the stashed post-G step, but is NOT a
        bit-exact replay of the synchronous schedule: (a) the generator
        update for t+1 uses D's parameters from t-1 (one step stale),
        and (b) the deferred d_step reads disc_stats (BatchNorm
        statistics / spectral-norm u,v) as advanced by batch t+1's
        G-phase discriminator forward, where the synchronous order
        would read batch t's. Both deviations are O(one step) and decay
        with training; tests/test_train.py::
        test_host_async_interleaved_drift_is_bounded quantifies the
        parameter drift over an interleaved window.
        Returns the PREVIOUS batch's disc loss, or None on the first
        step of an epoch; `drain_pending_d()` applies the final deferred
        update.
        """
        clean_d, noisy_d = shard_batch(self.mesh, clean, noisy)
        if self.cfg.train.pesq_label_mode == "device":
            with self._mesh_ctx():
                self.state, metrics, disc_loss = self.fused_step(
                    self.state, clean_d, noisy_d
                )
            self._maybe_ema()
            return metrics["gen_loss"], disc_loss
        if self.cfg.train.pesq_label_mode == "host_async":
            with self._mesh_ctx():
                self.state, metrics, handoff = self.g_step(
                    self.state, clean_d, noisy_d
                )
            # + 0 copies into a fresh buffer: the state pytree (incl.
            # .step) is donated to the next g_step, so a bare reference
            # would be invalidated before the deferred d_step reads it
            step_after_g = self.state.step + 0
            future = self._label_pool.submit(
                lambda est_dev, c=clean: pesq_labels_host(
                    c, np.asarray(est_dev)
                ),
                handoff["est_audio"],
            )
            disc_loss = self.drain_pending_d()
            self._pending_d = (handoff, future, step_after_g)
            self._maybe_ema()
            return metrics["gen_loss"], disc_loss
        with self._mesh_ctx():
            self.state, metrics, handoff = self.g_step(self.state, clean_d, noisy_d)
        est_audio = np.asarray(handoff["est_audio"])
        self._maybe_ema()
        scores = pesq_labels_host(clean, est_audio)
        with self._mesh_ctx():
            self.state, disc_loss = self.d_step(
                self.state,
                handoff["clean_mag"],
                handoff["est_mag"],
                shard_batch(self.mesh, scores),
            )
        return metrics["gen_loss"], disc_loss

    def _maybe_ema(self):
        """Fold the freshest generator params into the EMA tree
        (gen_ema_decay > 0); runs as one donated elementwise program."""
        if self._ema_update is not None:
            self.ema_params = self._ema_update(
                self.ema_params, self.state.gen_params
            )

    def ema_variables(self):
        """Inference variables with EMA-smoothed generator params (the
        current BatchNorm stats ride along, standard EMA practice).
        Requires cfg.train.gen_ema_decay > 0."""
        if self.ema_params is None:
            raise ValueError("gen_ema_decay is 0: no EMA tree is tracked")
        return {
            "params": self.ema_params,
            "batch_stats": self.state.gen_stats,
        }

    def restore_checkpoint(self, path: str):
        """Restore a full TrainState checkpoint into this trainer.

        When an EMA tree is tracked (gen_ema_decay > 0), it is restored
        from the sibling ``<path>_ema`` variables if present (written by
        save_checkpoint / the quality tools' rolling best), else
        re-seeded from the restored raw weights — never left tracking
        the stale pre-restore init (round-3 advisor finding).
        """
        from cmgan_tpu.checkpoint import restore_train_state

        self.state = replicate_state(
            self.mesh,
            restore_train_state(path, jax.device_get(self.state)),
        )
        if self.ema_params is not None:
            import jax.numpy as jnp

            seed = jax.device_get(self.state.gen_params)
            ema_path = path + "_ema"
            if os.path.isdir(ema_path):
                from cmgan_tpu.checkpoint import restore_variables

                seed = restore_variables(
                    ema_path,
                    {
                        "params": seed,
                        "batch_stats": jax.device_get(self.state.gen_stats),
                    },
                )["params"]
                log.info("restored EMA tree from %s", ema_path)
            self.ema_params = jax.jit(
                lambda t: jax.tree.map(jnp.asarray, t)
            )(seed)
        return self.state

    def drain_pending_d(self):
        """Apply the deferred discriminator update (host_async mode).

        Returns its disc loss as a device scalar, or None if nothing is
        pending. Called automatically each step and at epoch end, so
        every G step still gets exactly one matching D update, with the
        schedule evaluated at the stashed post-G step (identical to the
        synchronous order).
        """
        if self._pending_d is None:
            return None
        handoff, future, at_step = self._pending_d
        self._pending_d = None
        with self._mesh_ctx():
            self.state, disc_loss = self.d_step(
                self.state,
                handoff["clean_mag"],
                handoff["est_mag"],
                shard_batch(self.mesh, future.result()),
                at_step,
            )
        return disc_loss

    def train_epoch(self, epoch: int):
        import time

        interval = self.cfg.train.log_interval
        async_mode = self.cfg.train.pesq_label_mode == "host_async"
        pending = {}  # step_in_epoch -> {rows, gen, disc}
        flush_t0 = time.perf_counter()
        global_step0 = None

        def flush(step):
            # One blocking fetch for the whole window — the only host
            # sync per log_interval steps in device-label mode. Only
            # COMPLETE steps are fetched: in host_async mode a step's
            # disc loss arrives one call later, so the window boundary
            # step carries over to the next flush.
            nonlocal flush_t0
            done = [s for s in sorted(pending) if "disc" in pending[s]]
            if not done:
                return
            fetched = jax.device_get(
                [(pending[s]["gen"], pending[s]["disc"]) for s in done]
            )
            elapsed = time.perf_counter() - flush_t0
            flush_t0 = time.perf_counter()
            utt = sum(pending[s]["rows"] for s in done)
            rate = utt / elapsed if elapsed > 0 else 0.0
            if self.metrics_logger is not None:
                for s, (g, d) in zip(done, fetched):
                    self.metrics_logger.log(
                        global_step0 + s,
                        epoch=epoch,
                        gen_loss=float(g),
                        disc_loss=float(d),
                        step_seconds=elapsed / len(done),
                    )
            gen_loss, disc_loss = fetched[-1]
            log.info(
                "epoch %d step %d loss %.5f disc_loss %.5f (%.1f utt/s)",
                epoch,
                step,
                float(gen_loss),
                float(disc_loss),
                rate,
            )
            for s in done:
                del pending[s]

        step = 0
        for idx, (clean, noisy) in enumerate(self.train_loader):
            step = idx + 1
            if global_step0 is None:
                global_step0 = int(jax.device_get(self.state.step))
            gen_dev, disc_dev = self.train_step(clean, noisy)
            pending[step] = {"rows": clean.shape[0], "gen": gen_dev}
            if async_mode:
                if disc_dev is not None:  # belongs to the previous step
                    pending[step - 1]["disc"] = disc_dev
            else:
                pending[step]["disc"] = disc_dev
            if step % interval == 0:
                flush(step)
        final_disc = self.drain_pending_d()
        if final_disc is not None:
            pending[step]["disc"] = final_disc
        flush(step)

    def test(self) -> float:
        """Per-epoch eval pass; returns mean generator loss.

        Partial final batches are wrap-padded to a shardable size (the
        reference instead crashes into its one_labels size bug,
        src/train.py:181,212) and the averages are weighted by REAL rows
        only — padded duplicate rows never contaminate the reported loss.
        """
        if self.test_loader is None:
            return float("nan")
        n_dev = self.mesh.devices.size
        gen_total, disc_total, n = 0.0, 0.0, 0
        for clean, noisy in self.test_loader:
            real = clean.shape[0]
            if real % n_dev:
                reps = -(-n_dev // real) + 1
                pad = n_dev - real % n_dev
                clean = np.concatenate([clean, np.tile(clean, (reps, 1))[:pad]])
                noisy = np.concatenate([noisy, np.tile(noisy, (reps, 1))[:pad]])
            clean_d, noisy_d = shard_batch(self.mesh, clean, noisy)
            with self._mesh_ctx():
                metrics, handoff = self.test_fwd(self.state, clean_d, noisy_d)
            scores = pesq_labels_host(clean, np.asarray(handoff["est_audio"]))
            with self._mesh_ctx():
                disc_per_ex = self.test_disc_loss(
                    self.state,
                    handoff["clean_mag"],
                    handoff["est_mag"],
                    shard_batch(self.mesh, scores),
                )
            gen_per_ex = np.asarray(metrics["gen_loss_per_ex"])
            gen_total += float(np.sum(gen_per_ex[:real]))
            disc_total += float(np.sum(np.asarray(disc_per_ex)[:real]))
            n += real
        gen_avg = gen_total / max(n, 1)
        log.info(
            "test: gen loss %.5f disc loss %.5f", gen_avg, disc_total / max(n, 1)
        )
        return gen_avg

    def save_checkpoint(self, directory: str, epoch: int, test_loss: float):
        if jax.process_index() != 0:
            return
        from cmgan_tpu.checkpoint import save_train_state

        os.makedirs(directory, exist_ok=True)
        path = os.path.join(
            directory, f"CMGAN_epoch_{epoch}_{str(test_loss)[:5]}"
        )
        save_train_state(path, self.state)
        log.info("saved checkpoint %s", path)
        if self.ema_params is not None:
            from cmgan_tpu.checkpoint import save_variables

            save_variables(path + "_ema", jax.device_get(self.ema_variables()))
            log.info("saved EMA variables %s_ema", path)

    def train(self):
        cfg = self.cfg.train
        for epoch in range(cfg.epochs):
            self.train_epoch(epoch)
            test_loss = self.test()
            self.save_checkpoint(cfg.save_model_dir, epoch, test_loss)
