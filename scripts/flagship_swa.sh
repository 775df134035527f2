#!/bin/bash
# Flagship lever (d): tail weight averaging (ROADMAP item 1; NORTHSTAR.md
# "Flagship held-out push"). Resume the best 3x1024 checkpoint (held-out
# 2.0514 at step 785k) at the ORIGINAL lr 0.005 — the 4x boost is measured
# divergent (NORTHSTAR.md lever a) — retaining a snapshot at every eval.
# Afterwards, average the plateau tail:
#   python scripts/swa.py --out artifacts/flagship_swa/ckpt_swa.npz \
#       artifacts/flagship_swa/ckpt_step*.npz --last K
# and score it with `cli.py eval`.
#
# Usage: scripts/flagship_swa.sh [TIMEOUT_S] [EXTRA_ARGS...]
set -e
cd "$(dirname "$0")/.."
T=${1:-7200}
shift 1 2>/dev/null || true
test -f /tmp/bigcorpus.bin || python scripts/build_bigcorpus.py
mkdir -p artifacts/flagship_swa
# resume from the best snapshot, but checkpoint into a fresh dir so the
# scoreboard artifacts (ckpt_best.npz = 2.0514) are never racing this arm
# (cp -n exits 1 on existing dst under coreutils >= 9.2, so guard instead)
[ -f artifacts/flagship_swa/ckpt_best.npz ] || \
  cp artifacts/flagship_drop/ckpt_best.npz artifacts/flagship_swa/ckpt_best.npz
# a restart continues the arm's own trajectory rather than retracing from
# the 785k seed and clobbering earlier snapshots
RESUME=artifacts/flagship_drop/ckpt_best.npz
[ -f artifacts/flagship_swa/ckpt.npz ] && RESUME=artifacts/flagship_swa/ckpt.npz
exec timeout "$T" python -u -m eigen_lstm_tpu.cli train \
  --data /tmp/bigcorpus.bin --train-percent 0.992156 \
  --hidden 1024 --layers 3 --batch 128 --seq 256 \
  --dtype bfloat16 --backend pallas --stream-data --dropout 0.35 \
  --steps 2000000 --superstep 50 --log-every 2500 \
  --lr 0.005 --warmup 0 \
  --eval-every-s 600 --eval-chars 250000 --sample-chars 2000 \
  --keep-snapshots \
  --ckpt-dir artifacts/flagship_swa \
  --results artifacts/flagship_swa_results.jsonl \
  --resume "$RESUME" "$@"
