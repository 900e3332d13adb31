"""Quality-evidence training run (QUALITY_r02.md data source).

The full VCTK-DEMAND corpus and the released best_ckpt are absent from
this environment, so full PESQ-3.41 parity cannot be demonstrated
directly. This script produces the strongest evidence obtainable with
what IS here: train the reference recipe (fp32, host PESQ labels,
AdamW 5e-4/1e-3, loss weights 0.1/0.9/0.2/0.05, 2 s crops) on an
augmented corpus built from the 20 train-split sample pairs, and track
on HELD-OUT tracks (5 pairs never seen in training, neither as clean
speech nor as noise residual):

  - enhanced PESQ / composite metrics vs the noisy floor,
  - generator / discriminator loss curves (JSONL),
  - correlation of the discriminator's predicted quality score with the
    native PESQ scorer (the metric-GAN premise).

Usage:
  python tools/quality_run.py --out /tmp/qrun --minutes 180
  python tools/quality_run.py --out /tmp/qrun_bf16 --minutes 45 --bf16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cmgan_tpu.data import natsorted, read_wav, write_wav  # noqa: E402

REF = "/root/reference/AudioSamples"
# held-out tracks: never in training (as speech OR residual source).
# This is the legacy single split (rounds 2-3); --fold k rotates a
# k-fold partition over all 25 reference pairs instead (round-4
# verdict item 4: cross-validated mean±std rather than one split).
HOLDOUT = ["p232_005.wav", "p232_021.wav", "p257_008.wav", "p257_015.wav",
           "p257_023.wav"]


def fold_holdout(fold: int) -> list[str]:
    """Fold k of a deterministic 5-fold partition of the 25 pairs
    (natsorted, strided so each fold spans both speakers)."""
    names = natsorted(os.listdir(os.path.join(REF, "clean")))
    assert 0 <= fold < 5, fold
    return names[fold::5]


def build_split(out_dir: str, per_clean: int = 20, seed: int = 0,
                holdout: list[str] = HOLDOUT):
    """Augmented train set from the 20 non-holdout pairs + eval dir."""
    from tools.make_aug_dataset import build

    src = os.path.join(out_dir, "src_train")
    for sub in ("clean", "noisy"):
        os.makedirs(os.path.join(src, sub), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "eval", sub), exist_ok=True)
    names = natsorted(os.listdir(os.path.join(REF, "clean")))
    for n in names:
        for sub in ("clean", "noisy"):
            x, sr = read_wav(os.path.join(REF, sub, n))
            dst = src if n not in holdout else os.path.join(out_dir, "eval")
            write_wav(os.path.join(dst, sub, n), x[0], sr)
    build(src, os.path.join(out_dir, "train"), per_clean, seed=seed)


def eval_holdout(enhancer, out_dir: str, holdout: list[str] = HOLDOUT):
    """PESQ + composite metrics on held-out tracks, enhanced vs noisy."""
    from cmgan_tpu.metrics import compute_metrics

    rows = []
    for n in holdout:
        clean, _ = read_wav(os.path.join(out_dir, "eval", "clean", n))
        noisy, _ = read_wav(os.path.join(out_dir, "eval", "noisy", n))
        clean, noisy = clean[0].astype(np.float64), noisy[0].astype(np.float64)
        est = enhancer.enhance(noisy.astype(np.float32)).astype(np.float64)
        m = min(clean.size, noisy.size, est.size)
        enh = compute_metrics(clean[:m], est[:m], 16000)
        floor = compute_metrics(clean[:m], noisy[:m], 16000)
        rows.append({"track": n,
                     "enh": dict(zip(("pesq", "csig", "cbak", "covl", "ssnr", "stoi"), enh)),
                     "noisy": dict(zip(("pesq", "csig", "cbak", "covl", "ssnr", "stoi"), floor))})
    agg = {
        side: {k: float(np.mean([r[side][k] for r in rows]))
               for k in rows[0]["enh"]}
        for side in ("enh", "noisy")
    }
    return rows, agg


def disc_pesq_correlation(trainer, out_dir: str, cfg,
                          holdout: list[str] = HOLDOUT):
    """Correlate D's predicted score with native PESQ on held-out crops."""
    import jax
    import jax.numpy as jnp

    from cmgan_tpu.dsp import power_compress, stft
    from cmgan_tpu.metrics.pesq_native import pesq_batch
    from cmgan_tpu.models import MetricDiscriminator

    disc = MetricDiscriminator(cfg.model)
    state = jax.device_get(trainer.state)
    dvars = {"params": state.disc_params, "batch_stats": state.disc_stats}
    preds, trues = [], []
    rng = np.random.default_rng(0)
    for n in holdout:
        clean, _ = read_wav(os.path.join(out_dir, "eval", "clean", n))
        noisy, _ = read_wav(os.path.join(out_dir, "eval", "noisy", n))
        clean, noisy = clean[0], noisy[0]
        L = cfg.train.cut_len
        for _ in range(4):  # 4 random crops per track + mix levels
            if clean.size <= L:
                c = np.tile(clean, -(-L // clean.size))[:L]
                y = np.tile(noisy, -(-L // noisy.size))[:L]
            else:
                o = rng.integers(0, clean.size - L + 1)
                c, y = clean[o:o + L], noisy[o:o + L]
            alpha = float(rng.uniform(0.0, 1.0))  # blend -> quality sweep
            d = (1 - alpha) * c + alpha * y
            norm = np.sqrt(L / np.sum(y * y))
            spec_c = power_compress(stft(jnp.asarray(c * norm)[None], cfg.dsp.n_fft, cfg.dsp.hop))
            spec_d = power_compress(stft(jnp.asarray(d * norm)[None], cfg.dsp.n_fft, cfg.dsp.hop))
            mag_c = jnp.sqrt(spec_c[..., 0] ** 2 + spec_c[..., 1] ** 2)
            mag_d = jnp.sqrt(spec_d[..., 0] ** 2 + spec_d[..., 1] ** 2)
            pred = float(np.asarray(disc.apply(dvars, mag_c, mag_d, train=False)).ravel()[0])
            true = float(pesq_batch(c[None].astype(np.float64), d[None].astype(np.float64))[0])
            preds.append(pred)
            trues.append(true)
    preds, trues = np.array(preds), np.array(trues)
    # D predicts (pesq-1)/3.5
    trues_n = (trues - 1.0) / 3.5
    return {
        "pearson_r": float(np.corrcoef(preds, trues_n)[0, 1]),
        "n": int(preds.size),
        "pred_mean": float(preds.mean()),
        "true_mean": float(trues_n.mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--minutes", type=float, default=180.0)
    ap.add_argument("--max_steps", type=int, default=0,
                    help="stop after this many optimizer steps (0 = "
                    "time-bounded only); use for fixed-step A/B runs")
    ap.add_argument("--max_new_steps", type=int, default=0,
                    help="stop after this many steps BEYOND the resumed "
                    "checkpoint's step (relative form of --max_steps)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 MODEL COMPUTE dtype. Params, optimizer "
                    "state, losses and the iSTFT are fp32 either way "
                    "(flax param_dtype default + fp32 operand "
                    "promotion at the model boundary), i.e. this IS "
                    "the standard mixed-precision recipe; see "
                    "QUALITY_r04 precision audit")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--remat", action="store_true",
                    help="TSCB rematerialization (needed for fp32 "
                    "batch>4 on one 16 GB chip; same utt/s as batch 4)")
    ap.add_argument("--eval_every_epochs", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--per_clean", type=int, default=20)
    ap.add_argument("--fold", type=int, default=-1,
                    help="k-fold index in [0,5): hold out fold k of the "
                    "deterministic 5-fold partition of all 25 reference "
                    "pairs instead of the legacy fixed split (-1)")
    # The reference decays LR every 30 epochs of ~2.9k steps (~86k
    # steps). The augmented corpus has ~95-step epochs, so the default
    # epoch-keyed decay would fire ~30x too often; 900 epochs here ==
    # the reference's decay position in STEPS.
    ap.add_argument("--decay_epochs", type=int, default=900)
    ap.add_argument("--resume", type=str, default=None,
                    help="full TrainState checkpoint to continue from "
                    "(e.g. a previous quality run's ckpt)")
    ap.add_argument("--time_loss_domain", type=str, default="reference",
                    choices=("reference", "normalized"),
                    help="time-L1 target domain (see TrainConfig)")
    ap.add_argument("--pesq_label_mode", type=str, default="host",
                    choices=("host", "host_async", "device"),
                    help="PESQ label schedule for the D step")
    ap.add_argument("--ema_decay", type=float, default=0.0,
                    help="generator weight EMA (TrainConfig."
                    "gen_ema_decay); evals/saves the smoothed weights "
                    "alongside the raw ones")
    ap.add_argument("--data_from", type=str, default=None,
                    help="reuse train/eval dirs from a previous run dir "
                    "(symlinked) instead of building a corpus")
    ap.add_argument("--loss_region", type=str, default=None,
                    help="s0:s1 sample range for the supervised G losses "
                    "(TrainConfig.loss_region) — the streaming fine-tune "
                    "recipe; e.g. 20000:32000 for the emission region of "
                    "a 1.25s ctx / 0.5s chunk / 0.25s lookahead window")
    ap.add_argument("--init_gen", type=str, default=None,
                    help="initialize the GENERATOR (params+batch_stats) "
                    "from an exported inference-variables checkpoint "
                    "(e.g. reports/trained_generator_r04_ema); D and both "
                    "optimizers start fresh — the fine-tune entry point")
    ap.add_argument("--init_lr", type=float, default=None,
                    help="override TrainConfig.init_lr (use a lower LR "
                    "when fine-tuning from --init_gen)")
    ap.add_argument("--save_each_eval", action="store_true",
                    help="save step-tagged inference variables (EMA when "
                    "tracked, else raw) at every eval, for offline sweeps "
                    "such as the CPU streaming eval")
    ap.add_argument("--platform", type=str, default=None,
                    help="force a jax platform (e.g. cpu) — for the "
                    "tiny-scale reproduction smoke; default: the chip")
    ap.add_argument("--tiny_model", action="store_true",
                    help="reduced ModelConfig (16ch/2 TSCB/depth-2 "
                    "dense/2 heads — the dryrun's CI shape): exercises "
                    "the full recipe pipeline off-chip in minutes; "
                    "NOT a quality configuration")
    ap.add_argument("--holdout_limit", type=int, default=0,
                    help="score only the first N held-out tracks (the "
                    "train/holdout SPLIT is unchanged) — cuts the "
                    "per-eval compile cost for the CI smoke")
    args = ap.parse_args()

    import dataclasses

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # persistent compile cache (see bench.py): warm relaunches skip the
    # multi-minute remote compiles of the train/eval programs
    from cmgan_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(jax.config)
    import jax.numpy as jnp

    from cmgan_tpu.config import CMGANConfig, TrainConfig
    from cmgan_tpu.data.dataset import BatchLoader, DemandDataset
    from cmgan_tpu.inference import Enhancer
    from cmgan_tpu.train import Trainer

    holdout = HOLDOUT if args.fold < 0 else fold_holdout(args.fold)
    if args.holdout_limit:
        holdout_eval = holdout[: args.holdout_limit]
    else:
        holdout_eval = holdout
    os.makedirs(args.out, exist_ok=True)
    if args.data_from:
        for sub in ("train", "eval"):
            dst = os.path.join(args.out, sub)
            if not os.path.exists(dst):
                os.symlink(os.path.join(os.path.abspath(args.data_from), sub), dst)
    if not os.path.isdir(os.path.join(args.out, "train", "clean")):
        build_split(args.out, per_clean=args.per_clean, seed=args.seed,
                    holdout=holdout)

    cfg = CMGANConfig(
        train=dataclasses.replace(
            TrainConfig(),
            batch_size=args.batch,
            data_dir=os.path.join(args.out, "train"),
            save_model_dir=os.path.join(args.out, "ckpt"),
            log_interval=50,
            seed=args.seed,
            decay_epochs=args.decay_epochs,
            time_loss_domain=args.time_loss_domain,
            pesq_label_mode=args.pesq_label_mode,
            gen_ema_decay=args.ema_decay,
            loss_region=(tuple(int(v) for v in args.loss_region.split(":"))
                         if args.loss_region else None),
            **({"init_lr": args.init_lr} if args.init_lr is not None else {}),
        ),
    )
    if args.remat:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, remat=True)
        )
    if args.tiny_model:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, num_channels=16, num_tscb_blocks=2,
                dense_depth=2, attn_heads=2,
            )
        )
    ds = DemandDataset(cfg.train.data_dir, cfg.train.cut_len)
    train_loader = BatchLoader(
        ds, cfg.train.batch_size, shuffle=True, drop_last=True,
        seed=cfg.train.seed,
    )
    trainer = Trainer(
        cfg,
        train_loader,
        test_loader=None,
        dtype=jnp.bfloat16 if args.bf16 else None,
        metrics_path=os.path.join(args.out, "metrics.jsonl"),
    )
    if args.resume:
        # restores the TrainState AND the EMA tree (from <resume>_ema
        # when present, else re-seeded from the restored raw weights)
        trainer.restore_checkpoint(args.resume)
        print(f"resumed from {args.resume} at step "
              f"{int(jax.device_get(trainer.state.step))}", flush=True)
    if args.init_gen:
        # fine-tune entry: load exported generator variables into a
        # fresh TrainState (step 0, fresh D + optimizers); the EMA tree
        # re-seeds from the loaded weights
        from cmgan_tpu.checkpoint import restore_variables
        from cmgan_tpu.parallel import replicate_state

        host = jax.device_get(trainer.state)
        v = restore_variables(
            os.path.abspath(args.init_gen),
            {"params": host.gen_params, "batch_stats": host.gen_stats},
        )
        host = host.replace(gen_params=v["params"],
                            gen_stats=v["batch_stats"])
        trainer.state = replicate_state(trainer.mesh, host)
        if trainer.ema_params is not None:
            trainer.ema_params = jax.jit(
                lambda t: jax.tree.map(jnp.asarray, t)
            )(v["params"])
        print(f"generator initialized from {args.init_gen}", flush=True)
    if args.max_new_steps:
        args.max_steps = (
            int(jax.device_get(trainer.state.step)) + args.max_new_steps
        )

    def snapshot_eval(tag, attempts=3):
        # the remote-compile tunnel can transiently drop a response
        # ("response body closed before all bytes were read"); don't let
        # a flaky eval kill a multi-hour training run
        for attempt in range(attempts):
            try:
                return _snapshot_eval(tag)
            except Exception as exc:
                if attempt == attempts - 1:
                    raise
                print(f"[eval {tag}] attempt {attempt + 1} failed: {exc!r}; "
                      "retrying in 30 s", flush=True)
                time.sleep(30)

    # seed the rolling best from any evals already in this out dir, so a
    # --resume relaunch can't overwrite a better ckpt_best with a worse
    # first eval (round-2 advisor finding)
    best_pesq = [-1.0]
    best_ema_pesq = [-1.0]
    eval_path = os.path.join(args.out, "eval.jsonl")
    if os.path.exists(eval_path):
        with open(eval_path) as fh:
            prior = [json.loads(ln) for ln in fh if ln.strip()]
        if prior:
            best_pesq[0] = max(r["agg"]["enh"]["pesq"] for r in prior)
            ema_prior = [r["agg_ema"]["enh"]["pesq"] for r in prior
                         if r.get("agg_ema")]
            if ema_prior:
                best_ema_pesq[0] = max(ema_prior)
            print(f"seeded best_pesq={best_pesq[0]:.3f} from prior evals",
                  flush=True)

    def _snapshot_eval(tag):
        state = jax.device_get(trainer.state)
        variables = {"params": state.gen_params, "batch_stats": state.gen_stats}
        enh = Enhancer(cfg, variables)
        rows, agg = eval_holdout(enh, args.out, holdout=holdout_eval)
        corr = disc_pesq_correlation(trainer, args.out, cfg,
                                     holdout=holdout_eval)
        agg_ema = None
        if trainer.ema_params is not None:
            enh_ema = Enhancer(cfg, jax.device_get(trainer.ema_variables()))
            _, agg_ema = eval_holdout(enh_ema, args.out,
                                      holdout=holdout_eval)
            if agg_ema["enh"]["pesq"] > best_ema_pesq[0]:
                best_ema_pesq[0] = agg_ema["enh"]["pesq"]
                from cmgan_tpu.checkpoint import save_variables

                save_variables(
                    os.path.join(args.out, "ckpt_best_ema"),
                    jax.device_get(trainer.ema_variables()),
                )
        if agg["enh"]["pesq"] > best_pesq[0]:
            # rolling best checkpoint (fixed path, overwritten): an
            # interrupted run keeps its best resumable TrainState
            best_pesq[0] = agg["enh"]["pesq"]
            from cmgan_tpu.checkpoint import save_train_state

            save_train_state(
                os.path.join(args.out, "ckpt_best"), trainer.state
            )
        if args.save_each_eval:
            from cmgan_tpu.checkpoint import save_variables

            vs = (jax.device_get(trainer.ema_variables())
                  if trainer.ema_params is not None
                  else {"params": state.gen_params,
                        "batch_stats": state.gen_stats})
            save_variables(
                os.path.join(args.out, f"ckpt_step{int(state.step)}"), vs
            )
        rec = {"tag": tag, "step": int(state.step), "time": time.time(),
               "fold": args.fold, "holdout": holdout_eval,
               "agg": agg, "rows": rows, "disc_corr": corr}
        if agg_ema is not None:
            rec["agg_ema"] = agg_ema
        with open(os.path.join(args.out, "eval.jsonl"), "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        ema_txt = (f" ema_pesq={agg_ema['enh']['pesq']:.3f}"
                   if agg_ema is not None else "")
        print(f"[eval {tag}] step={rec['step']} "
              f"enh_pesq={agg['enh']['pesq']:.3f} noisy_pesq={agg['noisy']['pesq']:.3f} "
              f"disc_r={corr['pearson_r']:.3f}{ema_txt}", flush=True)
        return rec

    snapshot_eval("init")
    deadline = time.time() + args.minutes * 60
    epoch = 0
    while time.time() < deadline:
        trainer.train_epoch(epoch)
        epoch += 1
        if args.max_steps and int(jax.device_get(trainer.state.step)) >= args.max_steps:
            break
        if epoch % args.eval_every_epochs == 0:
            snapshot_eval(f"epoch{epoch}")
    final = snapshot_eval("final")
    trainer.save_checkpoint(cfg.train.save_model_dir, epoch, final["agg"]["enh"]["pesq"])
    print(json.dumps({"epochs": epoch, "final": final["agg"]}, indent=None))


if __name__ == "__main__":
    main()
