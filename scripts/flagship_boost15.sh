#!/bin/bash
# Flagship lever (f): MILD Adagrad lr kick on resume (NORTHSTAR.md lever
# scorecard). The 4x kick is measured divergent (lever a: held-out 2.051 ->
# 4.285); this arm measures the remaining untried point, 1.5x (lr 0.0075),
# resuming the best iterate (step 920k, held-out 2.0250,
# artifacts/flagship_swa/ckpt_best.npz) with per-eval snapshots retained so
# the tail stays ensemble/SWA-averageable.
#
# Usage: scripts/flagship_boost15.sh [TIMEOUT_S] [EXTRA_ARGS...]
set -e
cd "$(dirname "$0")/.."
T=${1:-7200}
shift 1 2>/dev/null || true
test -f /tmp/bigcorpus.bin || python scripts/build_bigcorpus.py
mkdir -p artifacts/flagship_boost15
# seed best-checkpoint retention from the arm's own starting point so only a
# strictly-better held-out eval overwrites it
[ -f artifacts/flagship_boost15/ckpt_best.npz ] || \
  cp artifacts/flagship_swa/ckpt_best.npz artifacts/flagship_boost15/ckpt_best.npz
# a restart continues the arm's own trajectory rather than retracing from
# the 920k seed and clobbering earlier snapshots
RESUME=artifacts/flagship_swa/ckpt_best.npz
[ -f artifacts/flagship_boost15/ckpt.npz ] && RESUME=artifacts/flagship_boost15/ckpt.npz
exec timeout "$T" python -u -m eigen_lstm_tpu.cli train \
  --data /tmp/bigcorpus.bin --train-percent 0.992156 \
  --hidden 1024 --layers 3 --batch 128 --seq 256 \
  --dtype bfloat16 --backend pallas --stream-data --dropout 0.35 \
  --steps 2000000 --superstep 50 --log-every 2500 \
  --lr 0.0075 --warmup 0 \
  --eval-every-s 600 --eval-chars 250000 --sample-chars 2000 \
  --keep-snapshots \
  --ckpt-dir artifacts/flagship_boost15 \
  --results artifacts/flagship_boost15_results.jsonl \
  --resume "$RESUME" "$@"
