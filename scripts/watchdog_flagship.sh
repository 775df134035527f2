#!/bin/bash
# Stall watchdog for the round-5 flagship run over the tunneled TPU.
#
# Why: the axon tunnel can drop a client RPC and leave the training
# process futex-waiting forever while the chip itself stays healthy
# (observed 2026-08-20: flagship wedged at step 42.5k for 15+ min while a
# fresh process ran matmuls fine). The run checkpoints every eval, so the
# cheap, safe remedy is: if the run log stops growing for STALL_S, kill
# THAT pid (recorded at spawn — never pattern-matched) and relaunch; the
# script resumes from artifacts/flagship_full/ckpt.npz.
#
# Usage: scripts/watchdog_flagship.sh [TOTAL_S] [STALL_S]
set -u
cd "$(dirname "$0")/.."
TOTAL=${1:-30000}
STALL=${2:-600}
LOG=artifacts/flagship_full_run.log
DEADLINE=$(( $(date +%s) + TOTAL ))

spawn() {
  nohup bash scripts/flagship_full.sh "$(( DEADLINE - $(date +%s) ))" \
    >> "$LOG" 2>&1 &
  PID=$!
  echo "[watchdog] spawned flagship pid=$PID" >> "$LOG"
}

alive() { kill -0 "$PID" 2>/dev/null; }

# adopt an already-running instance if its pid was recorded, else spawn
if [ -f /tmp/flagship.pid ] && kill -0 "$(cat /tmp/flagship.pid)" 2>/dev/null; then
  PID=$(cat /tmp/flagship.pid)
  echo "[watchdog] adopting flagship pid=$PID" >> "$LOG"
else
  spawn
fi
echo "$PID" > /tmp/flagship.pid

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  sleep 60
  if ! alive; then
    # finished or died: relaunch (resumes from its own checkpoint)
    [ "$(date +%s)" -lt $(( DEADLINE - 120 )) ] || break
    spawn
    echo "$PID" > /tmp/flagship.pid
    continue
  fi
  AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  if [ "$AGE" -gt "$STALL" ]; then
    echo "[watchdog] log stale ${AGE}s — killing wedged pid=$PID" >> "$LOG"
    # the recorded pid is `timeout`'s child tree root via nohup bash; kill
    # the whole process group of the run script only
    kill "$PID" 2>/dev/null
    sleep 5
    kill -9 "$PID" 2>/dev/null
    # also reap the cli child if it survived its parent (recorded pid only)
    for c in $(pgrep -P "$PID" 2>/dev/null); do kill -9 "$c" 2>/dev/null; done
    sleep 5
    spawn
    echo "$PID" > /tmp/flagship.pid
  fi
done
echo "[watchdog] deadline reached" >> "$LOG"
