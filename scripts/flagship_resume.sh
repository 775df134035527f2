#!/bin/bash
# Resume the flagship held-out push (NORTHSTAR.md "Flagship held-out push")
# from artifacts/flagship_drop/ckpt.npz with an Adagrad lr boost — after
# ~780k steps the accumulated m has shrunk the effective step ~25x, so a
# raised lr on resume recovers step size without resetting the accumulator
# (ROADMAP item 1 lever b / VERDICT r3 next-steps 2).
#
# Usage: scripts/flagship_resume.sh [LR] [TIMEOUT_S] [EXTRA_ARGS...]
# The corpus sidecar /tmp/bigcorpus.bin.json documents --train-percent.
set -e
cd "$(dirname "$0")/.."
LR=${1:-0.02}
T=${2:-23000}
shift 2 2>/dev/null || shift $# || true
test -f /tmp/bigcorpus.bin || python scripts/build_bigcorpus.py
exec timeout "$T" python -u -m eigen_lstm_tpu.cli train \
  --data /tmp/bigcorpus.bin --train-percent 0.992156 \
  --hidden 1024 --layers 3 --batch 128 --seq 256 \
  --dtype bfloat16 --backend pallas --stream-data --dropout 0.35 \
  --steps 2000000 --superstep 50 --log-every 2500 \
  --lr "$LR" --warmup 500 \
  --eval-every-s 900 --eval-chars 250000 --sample-chars 2000 \
  --ckpt-dir artifacts/flagship_drop \
  --results artifacts/flagship_drop_results.jsonl \
  --resume artifacts/flagship_drop/ckpt.npz "$@"
