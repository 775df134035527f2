#!/bin/bash
# Round-5 lever: MILD (1.5x) Adagrad lr kick on resume, on the full-inventory
# corpus (VERDICT r4 item 3 — the remaining untried point of the lr-boost
# family: 4x diverged on the r3 corpus, NORTHSTAR.md lever a). Resumes the
# flagship_full best checkpoint at lr 0.0075 (1.5 x 0.005), no warmup, with
# per-eval snapshots retained so the tail stays ensemble/SWA-averageable.
#
# --clip-norm 2.0 matches the parent arm (gradient-spike incident,
# NORTHSTAR.md round 5); without it one bad batch poisons Adagrad.
# Launch ONLY once flagship_full has plateaued (NORTHSTAR.md round-5 table).
# Usage: scripts/flagship_full_boost15.sh [TIMEOUT_S] [EXTRA_ARGS...]
set -e
cd "$(dirname "$0")/.."
T=${1:-7200}
shift 1 2>/dev/null || true
test -f /tmp/bigcorpus_full.bin || python scripts/build_bigcorpus.py \
  --ref-data --out /tmp/bigcorpus_full.bin --holdout-frac 0.05
TP=$(python -c "import json; print(json.load(open('/tmp/bigcorpus_full.bin.json'))['train_percent'])")
mkdir -p artifacts/flagship_full_boost15
# seed best-checkpoint retention from the arm's own starting point so only a
# strictly-better held-out eval overwrites it
[ -f artifacts/flagship_full_boost15/ckpt_best.npz ] || \
  cp artifacts/flagship_full/ckpt_best.npz artifacts/flagship_full_boost15/ckpt_best.npz
# a restart continues the arm's own trajectory rather than retracing from
# the seed and clobbering earlier snapshots
RESUME=artifacts/flagship_full/ckpt_best.npz
[ -f artifacts/flagship_full_boost15/ckpt.npz ] && RESUME=artifacts/flagship_full_boost15/ckpt.npz
exec timeout "$T" python -u -m eigen_lstm_tpu.cli train \
  --data /tmp/bigcorpus_full.bin --train-percent "$TP" \
  --hidden 1024 --layers 3 --batch 128 --seq 256 \
  --dtype bfloat16 --backend pallas --stream-data --dropout 0.2 \
  --steps 2000000 --superstep 50 --log-every 2500 \
  --lr 0.0075 --warmup 0 --clip-norm 2.0 \
  --eval-every-s 600 --eval-chars 250000 --sample-chars 2000 \
  --keep-snapshots \
  --ckpt-dir artifacts/flagship_full_boost15 \
  --results artifacts/flagship_full_boost15_results.jsonl \
  --resume "$RESUME" "$@"
