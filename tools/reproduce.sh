#!/bin/bash
# One-command reproduction of the committed best-recipe checkpoint
# (QUALITY_r05 headline): corpus-build -> train (bf16 mixed precision,
# normalized-domain time loss, on-device PESQ labels, weight EMA 0.999,
# batch 8 + TSCB remat) -> held-out eval each 1000 steps -> export the
# inference checkpoint. Mirrors the reference's train/eval usage
# surface (reference/README.md:34-43) as a single command.
#
# Full run (defaults, ~90 min on one v5e chip):
#   tools/reproduce.sh
# Tiny CI smoke (reduced model, CPU, ~2 min):
#   SMOKE=1 tools/reproduce.sh
#
# Env knobs: OUT (run dir), STEPS, BATCH, PER_CLEAN, MINUTES, SEED.
# The result lands within eval-oscillation noise (±0.02-0.04 PESQ) of
# reports/trained_generator_r04{,_ema}'s committed metrics; the final
# line prints where the curve (eval.jsonl) and export live.
set -e
cd "$(dirname "$0")/.."

OUT=${OUT:-/tmp/cmgan_reproduce}
if [ "${SMOKE:-0}" = "1" ]; then
    STEPS=${STEPS:-2}
    EXTRA="--platform cpu --tiny_model --eval_every_epochs 1000 --holdout_limit 2"
    BATCH=${BATCH:-2}
    PER_CLEAN=${PER_CLEAN:-1}
    # the smoke's tiny batch can't shard over an inherited multi-device
    # CPU mesh (the test suite forces 8 virtual devices; batch 2 is not
    # divisible by 8) — pin one virtual device for the smoke only
    export XLA_FLAGS="--xla_force_host_platform_device_count=1"
else
    STEPS=${STEPS:-8000}
    EXTRA="--eval_every_epochs 10"
    BATCH=${BATCH:-8}
    PER_CLEAN=${PER_CLEAN:-40}
fi

python tools/quality_run.py --out "$OUT" --minutes "${MINUTES:-300}" \
    --max_steps "$STEPS" --bf16 --batch "$BATCH" --remat \
    --time_loss_domain normalized --pesq_label_mode device \
    --ema_decay 0.999 --seed "${SEED:-0}" --per_clean "$PER_CLEAN" \
    $EXTRA
python tools/export_generator.py --ckpt "$OUT/ckpt_best_ema" \
    --out "$OUT/generator_ema"
echo "reproduce: eval curve at $OUT/eval.jsonl, exported EMA generator at $OUT/generator_ema"
