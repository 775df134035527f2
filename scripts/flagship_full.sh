#!/bin/bash
# Round-5 flagship: train on the FULL reference data inventory. The r4
# judge found the reference also ships 20_newsgroups (48.5 MB) +
# reuters21578 (28.0 MB) under lstm_eigen_BLAS/ — ~8x more unique text
# than the r3/r4 corpus, dissolving the memorization regime (train 1.29 /
# test 2.03) the 3x1024 run plateaued in. Target: the reference's best
# published row, test 1.823 bpc (enwik8 N=256 S=10 B=1024, 156 h,
# models/enwik8_newton_N256_S10_B1024_reset_std_0_01.txt rows 311-313).
#
# Recipe: the proven 3x1024 B=128 S=256 bf16 Pallas config; dropout
# re-tuned DOWN to 0.2 (VERDICT r4 item 1: the gap 0.35 fought shrinks
# with 8x data); lr 0.005 as measured stable for this depth. Per-eval
# snapshots retained for the ensemble/SWA levers.
#
# --clip-norm 2.0 (added mid-round-5): between the 162.5k eval (1.450)
# and 195k (1.614) a single gradient spike — unclipped, the reference
# has no clipping — permanently poisoned the Adagrad accumulators of
# layers 0-1 (||m|| grew ~100x the normal interval rate) and cost
# +0.16 held-out. Normal gnorm at this depth is ~0.22 mean, so 2.0
# only engages on pathological batches (forensics: scripts/
# diag_resume.py, NORTHSTAR.md round-5 incident note).
#
# Usage: scripts/flagship_full.sh [TIMEOUT_S] [EXTRA_ARGS...]
set -e
cd "$(dirname "$0")/.."
T=${1:-28800}
shift 1 2>/dev/null || true
test -f /tmp/bigcorpus_full.bin || python scripts/build_bigcorpus.py \
  --ref-data --out /tmp/bigcorpus_full.bin --holdout-frac 0.05 --target-mb 1
TP=$(python -c "import json; print(json.load(open('/tmp/bigcorpus_full.bin.json'))['train_percent'])")
mkdir -p artifacts/flagship_full
# a restart continues the arm's own trajectory (fresh run otherwise)
RESUME_ARGS=()
[ -f artifacts/flagship_full/ckpt.npz ] && \
  RESUME_ARGS=(--resume artifacts/flagship_full/ckpt.npz)
exec timeout "$T" python -u -m eigen_lstm_tpu.cli train \
  --data /tmp/bigcorpus_full.bin --train-percent "$TP" \
  --hidden 1024 --layers 3 --batch 128 --seq 256 \
  --dtype bfloat16 --backend pallas --stream-data --dropout 0.2 \
  --steps 2000000 --superstep 50 --log-every 2500 \
  --lr 0.005 --warmup 1000 --clip-norm 2.0 \
  --eval-every-s 900 --eval-chars 250000 --sample-chars 2000 \
  --keep-snapshots \
  --ckpt-dir artifacts/flagship_full \
  --results artifacts/flagship_full_results.jsonl \
  "${RESUME_ARGS[@]}" "$@"
