"""Multi-process (multi-host analog) data-parallel training smoke test.

Launch N processes of this script; each owns a slice of a CPU device
"pod" and loads its own data shard. Validates that the SPMD training
step, the process-sharded BatchLoader, and the replicated train state
work across process boundaries — the multi-host story the reference
lacks entirely (its DDP master address is hardcoded to localhost,
reference src/train.py:40).

    python tools/multihost_smoke.py <process_id> <num_processes>

Run conveniently via: python tools/multihost_smoke.py --launch 2
"""

from __future__ import annotations

import os
import subprocess
import sys


def launch(n: int):
    procs = []
    for pid in range(n):
        env = dict(os.environ)
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), str(pid), str(n)],
                env=env,
            )
        )
    codes = [p.wait(timeout=900) for p in procs]
    if any(codes):
        raise SystemExit(f"worker exit codes: {codes}")
    print("MULTIHOST SMOKE PASSED")


def worker(process_id: int, num_processes: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address="localhost:12921",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    n_global = len(jax.devices())
    assert n_global == 4 * num_processes, n_global

    import dataclasses

    import numpy as np

    from cmgan_tpu.config import CMGANConfig, MeshConfig, ModelConfig, TrainConfig
    from cmgan_tpu.parallel import make_mesh, replicate_state, shard_batch
    from cmgan_tpu.train import init_train_state, make_train_steps

    cut_len = 4000
    cfg = CMGANConfig(
        model=ModelConfig(
            num_channels=16, num_tscb_blocks=1, dense_depth=2, attn_heads=2, ndf=4
        ),
        train=dataclasses.replace(
            TrainConfig(), batch_size=n_global, cut_len=cut_len,
            pesq_label_mode="device",
        ),
        mesh=MeshConfig(data_parallel=n_global),
    )
    mesh = make_mesh(cfg.mesh)

    *_, fused = make_train_steps(cfg, steps_per_epoch=10)
    state = replicate_state(mesh, init_train_state(cfg, 0, steps_per_epoch=10))

    # identical global batch on every process (deterministic seed), each
    # process device_puts only its addressable shard
    rng = np.random.default_rng(0)
    clean = rng.standard_normal((n_global, cut_len)).astype(np.float32) * 0.1
    noisy = clean + rng.standard_normal((n_global, cut_len)).astype(np.float32) * 0.03

    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    clean_d = jax.make_array_from_process_local_data(sharding, clean)
    noisy_d = jax.make_array_from_process_local_data(sharding, noisy)

    state, metrics, disc_loss = fused(state, clean_d, noisy_d)
    gen_loss = float(metrics["gen_loss"])
    print(f"[process {process_id}] gen_loss={gen_loss:.5f} "
          f"disc_loss={float(disc_loss):.5f}", flush=True)
    assert np.isfinite(gen_loss)
    jax.distributed.shutdown()


if __name__ == "__main__":
    if sys.argv[1] == "--launch":
        launch(int(sys.argv[2]))
    else:
        worker(int(sys.argv[1]), int(sys.argv[2]))
