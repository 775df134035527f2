#!/bin/bash
# Equal-footing control on the ROUND-5 corpus: the reference's own best
# published config — N=256, S=10, B=1024, reset_std=0.01, Adagrad lr=0.1
# (models/enwik8_newton_N256_S10_B1024_reset_std_0_01.txt; lr from
# class_CUDA/lstm.cc:65, loss on the last timestep per lstm.cc:207-218) —
# run in THIS framework on the same corpus/split as the flagship, so the
# flagship-vs-reference-config comparison holds at equal data (VERDICT r4
# item 1; the r3 control on the old corpus sits in
# artifacts/refcfg_n256_results.jsonl at test 3.57).
#
# Usage: scripts/refcfg_control_full.sh [TIMEOUT_S] [EXTRA_ARGS...]
set -e
cd "$(dirname "$0")/.."
T=${1:-1500}
shift 1 2>/dev/null || true
test -f /tmp/bigcorpus_full.bin || python scripts/build_bigcorpus.py \
  --ref-data --out /tmp/bigcorpus_full.bin --holdout-frac 0.05 --target-mb 1
TP=$(python -c "import json; print(json.load(open('/tmp/bigcorpus_full.bin.json'))['train_percent'])")
mkdir -p artifacts/refcfg_full
exec timeout "$T" python -u -m eigen_lstm_tpu.cli train \
  --data /tmp/bigcorpus_full.bin --train-percent "$TP" \
  --hidden 256 --layers 1 --batch 1024 --seq 10 \
  --loss-mode last --reset-std 0.01 \
  --steps 5000000 --superstep 200 --log-every 20000 \
  --lr 0.1 \
  --eval-every-s 600 --eval-chars 250000 --sample-chars 0 \
  --ckpt-dir artifacts/refcfg_full \
  --results artifacts/refcfg_full_results.jsonl "$@"
