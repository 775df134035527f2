#!/bin/bash
# Round-5 lever: cyclic-lr SWA on the full-inventory corpus (VERDICT r4
# weak #4 — the r4 SWA arm ran at CONSTANT lr, which is not SWA's actual
# prescription). This arm resumes the flagship_full best checkpoint with
# the cyclical schedule (--lr-cycle-steps): lr decays linearly 0.005 ->
# 0.0005 over each 3,000-step cycle then resets, with per-eval snapshots
# retained on a cadence (~45 min of steps per cycle at ~1.1M chars/s ...
# eval-every-s 600 lands ~2-3 snapshots per cycle, including near-minima).
# Afterwards average the tail and score it:
#   python scripts/swa.py --out artifacts/flagship_full_swa/ckpt_swa.npz \
#       artifacts/flagship_full_swa/ckpt_step*.npz --last K
#   python -m eigen_lstm_tpu.cli eval ... (same footing as the arm's evals)
#
# --clip-norm 2.0 matches the parent arm (gradient-spike incident,
# NORTHSTAR.md round 5); without it one bad batch poisons Adagrad.
# Launch ONLY once flagship_full has plateaued (NORTHSTAR.md round-5 table).
# Usage: scripts/flagship_full_swa.sh [TIMEOUT_S] [EXTRA_ARGS...]
set -e
cd "$(dirname "$0")/.."
T=${1:-7200}
shift 1 2>/dev/null || true
test -f /tmp/bigcorpus_full.bin || python scripts/build_bigcorpus.py \
  --ref-data --out /tmp/bigcorpus_full.bin --holdout-frac 0.05
TP=$(python -c "import json; print(json.load(open('/tmp/bigcorpus_full.bin.json'))['train_percent'])")
mkdir -p artifacts/flagship_full_swa
[ -f artifacts/flagship_full_swa/ckpt_best.npz ] || \
  cp artifacts/flagship_full/ckpt_best.npz artifacts/flagship_full_swa/ckpt_best.npz
RESUME=artifacts/flagship_full/ckpt_best.npz
[ -f artifacts/flagship_full_swa/ckpt.npz ] && RESUME=artifacts/flagship_full_swa/ckpt.npz
exec timeout "$T" python -u -m eigen_lstm_tpu.cli train \
  --data /tmp/bigcorpus_full.bin --train-percent "$TP" \
  --hidden 1024 --layers 3 --batch 128 --seq 256 \
  --dtype bfloat16 --backend pallas --stream-data --dropout 0.2 \
  --steps 2000000 --superstep 50 --log-every 2500 \
  --lr 0.005 --warmup 0 --clip-norm 2.0 \
  --lr-cycle-steps 3000 --lr-cycle-min-frac 0.1 \
  --eval-every-s 600 --eval-chars 250000 --sample-chars 2000 \
  --keep-snapshots \
  --ckpt-dir artifacts/flagship_full_swa \
  --results artifacts/flagship_full_swa_results.jsonl \
  --resume "$RESUME" "$@"
