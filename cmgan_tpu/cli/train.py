"""Training CLI — the analog of reference src/train.py:16-31.

    python -m cmgan_tpu.cli.train --data_dir <VCTK-DEMAND root> \
        --save_model_dir ./saved_model

One process drives all local devices (SPMD); multi-host runs initialize
jax.distributed before calling main().
"""

from __future__ import annotations

import argparse
import dataclasses
import logging

from cmgan_tpu.config import CMGANConfig, MeshConfig, TrainConfig


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Train CMGAN-TPU on VCTK-DEMAND")
    d = TrainConfig()
    p.add_argument("--epochs", type=int, default=d.epochs)
    p.add_argument("--batch_size", type=int, default=d.batch_size,
                   help="per-device batch size (reference: per-GPU batch)")
    p.add_argument("--log_interval", type=int, default=d.log_interval)
    p.add_argument("--decay_epoch", type=int, default=d.decay_epochs)
    p.add_argument("--init_lr", type=float, default=d.init_lr)
    p.add_argument("--cut_len", type=int, default=d.cut_len)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--save_model_dir", type=str, default=d.save_model_dir)
    p.add_argument("--loss_weights", type=float, nargs=4,
                   default=list(d.loss_weights),
                   help="RI, magnitude, time, metric-GAN weights")
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint path to resume from")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (fp32 params)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize conformer blocks (bigger batches)")
    p.add_argument("--pesq_label_mode", type=str, default=d.pesq_label_mode,
                   choices=("host", "host_async", "device"),
                   help="PESQ label path: reference-faithful synchronous "
                   "host scorer, overlapped host scorer (D one step "
                   "stale), or fused on-device scorer")
    p.add_argument("--time_loss_domain", type=str, default=d.time_loss_domain,
                   choices=("reference", "normalized"),
                   help="time-L1 target: raw clean (reference quirk, "
                   "suppresses output gain) or clean*c (gain-consistent)")
    p.add_argument("--ema_decay", type=float, default=d.gen_ema_decay,
                   help="generator weight EMA decay (0 disables); the "
                   "smoothed weights are saved alongside each epoch "
                   "checkpoint as <save_model_dir>/..._ema")
    return p.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from cmgan_tpu.config import ModelConfig

    n_devices = len(jax.devices())
    cfg = CMGANConfig(
        model=ModelConfig(remat=args.remat),
        train=dataclasses.replace(
            TrainConfig(),
            epochs=args.epochs,
            batch_size=args.batch_size * n_devices,
            log_interval=args.log_interval,
            decay_epochs=args.decay_epoch,
            init_lr=args.init_lr,
            cut_len=args.cut_len,
            data_dir=args.data_dir,
            save_model_dir=args.save_model_dir,
            loss_weights=tuple(args.loss_weights),
            seed=args.seed,
            pesq_label_mode=args.pesq_label_mode,
            time_loss_domain=args.time_loss_domain,
            gen_ema_decay=args.ema_decay,
        ),
        mesh=MeshConfig(),
    )

    from cmgan_tpu.data.dataset import load_data
    from cmgan_tpu.train import Trainer

    train_loader, test_loader = load_data(
        cfg.train.data_dir, cfg.train.batch_size, cfg.train.cut_len, cfg.train.seed
    )
    trainer = Trainer(
        cfg,
        train_loader,
        test_loader,
        dtype=jnp.bfloat16 if args.bf16 else None,
    )
    if args.resume:
        from cmgan_tpu.checkpoint import restore_train_state
        from cmgan_tpu.parallel import replicate_state

        trainer.state = replicate_state(
            trainer.mesh,
            restore_train_state(args.resume, jax.device_get(trainer.state)),
        )
    trainer.train()


if __name__ == "__main__":
    main()
