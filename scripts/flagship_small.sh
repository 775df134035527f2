#!/bin/bash
# Flagship variant: ROADMAP item 1 levers (b)+(c) — a smaller 2x768 model
# with lower dropout and tied input/output embeddings, against the
# memorization gap that plateaued the 3x1024 run at held-out ~2.05
# (NORTHSTAR.md "Flagship held-out push"; VERDICT r3 next-steps 2).
# Tying changes the parameter structure, so this is a fresh run, not a
# resume; combining (b) and (c) in one arm is deliberate — both levers
# attack the same train->test gap and chip time is the scarce resource.
#
# Usage: scripts/flagship_small.sh [TIMEOUT_S] [EXTRA_ARGS...]
set -e
cd "$(dirname "$0")/.."
T=${1:-23000}
shift 1 2>/dev/null || true
test -f /tmp/bigcorpus.bin || python scripts/build_bigcorpus.py
exec timeout "$T" python -u -m eigen_lstm_tpu.cli train \
  --data /tmp/bigcorpus.bin --train-percent 0.992156 \
  --hidden 768 --layers 2 --batch 128 --seq 256 \
  --dtype bfloat16 --backend pallas --stream-data \
  --dropout 0.2 --tie-embeddings \
  --steps 2000000 --superstep 50 --log-every 2500 \
  --lr 0.02 --warmup 1000 \
  --eval-every-s 900 --eval-chars 250000 --sample-chars 2000 \
  --ckpt-dir artifacts/flagship_small \
  --results artifacts/flagship_small_results.jsonl "$@"
