#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line.

Headline config per BASELINE.json: 1-layer char LSTM, hidden 512, batch 128,
seq 100, segment-mode training on enwik6, bf16 matmul / fp32 accum, on one
TPU chip. ``vs_baseline`` is the speedup over the single-core Eigen+BLAS
reference normalized by the analytic FLOP model (see
eigen_lstm_tpu/bench.py for methodology; north star is >=50x).

Robustness (round-4): the axon TPU tunnel wedges transiently — a cold
``import jax; jax.devices()`` can hang for minutes or raise UNAVAILABLE
(BENCH_r03 rc=1). The benchmark therefore (a) probes backend health in a
timeout-bounded SUBPROCESS with bounded backoff before touching jax in this
process, and (b) on any failure still prints one machine-readable JSON line
(with an "error" field) instead of a traceback, exiting nonzero.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# probe schedule: wait-then-probe; probe itself bounded so a wedged tunnel
# cannot hang this process. Worst case ~ 30+60+120 waits + 3x150 probes ~= 11m.
PROBE_TIMEOUT_S = float(os.environ.get("EIGEN_LSTM_BENCH_PROBE_TIMEOUT_S", 150))

# deterministic seeded run: ±0.15 around the measured value of THIS bench
# config (round-3 TPU measurement of the 3,300-step median-of-5 bench:
# train_bpc 2.5572, windows 15.98-16.11 M chars/s). Earlier anchors do NOT
# apply: BENCH_r02's 3.5006 was the 600-step round-2 bench — the config
# trains 5.5x longer now, so its deterministic bpc is lower. Gated by
# tests/test_cli.py::test_bench_bpc_band, so a <1-bpc silent math
# regression fails the gate (VERDICT r3 item 4).
BPC_BAND = (2.40, 2.70)
PROBE_BACKOFFS_S = tuple(
    float(s) for s in os.environ.get(
        "EIGEN_LSTM_BENCH_PROBE_BACKOFFS_S", "0,30,60,120"
    ).split(",")
)


def _probe_backend_once() -> tuple[bool, str]:
    """Check (in a killable subprocess) that jax sees a usable device."""
    code = (
        "import jax; d = jax.devices();"
        "print('PLATFORM=' + d[0].platform, flush=True)"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        return False, f"probe timeout after {PROBE_TIMEOUT_S:.0f}s (tunnel wedged)"
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-1:]
        return False, f"probe rc={proc.returncode}: {' '.join(tail)[:300]}"
    for line in proc.stdout.splitlines():
        if line.startswith("PLATFORM="):
            return True, line.split("=", 1)[1]
    return False, "probe printed no platform"


def _wait_for_backend() -> tuple[bool, str]:
    last = "no probe ran"
    for wait_s in PROBE_BACKOFFS_S:
        if wait_s:
            print(f"bench: backend unavailable, retrying in {wait_s}s "
                  f"({last})", file=sys.stderr, flush=True)
            time.sleep(wait_s)
        ok, last = _probe_backend_once()
        if ok:
            return True, last
    return False, last


def _error_line(msg: str) -> None:
    print(json.dumps({
        "metric": "train_chars_per_sec H=512 B=128 S=100 bfloat16",
        "value": 0.0,
        "unit": "chars/sec/chip",
        "vs_baseline": 0.0,
        "error": msg,
    }), flush=True)


def main():
    ok, platform = _wait_for_backend()
    if not ok:
        _error_line(f"backend_unavailable: {platform}")
        raise SystemExit(1)

    from eigen_lstm_tpu.bench import run_benchmark
    from eigen_lstm_tpu.cli import build_parser
    from eigen_lstm_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    data = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "enwik6.txt")
    argv = [
        "bench",
        "--data", data,
        "--hidden", "512",
        "--batch", "128",
        "--seq", "100",
        "--dtype", "bfloat16",
        "--train-percent", "1.0",
        # 50 steps/superstep ≈ 48 ms device time per dispatch: enough to hide
        # the ~45 ms tunnel roundtrip that starves the device at superstep=10
        "--superstep", "50",
        # 5 timing windows x 600 steps (~0.6 s device each): long enough that
        # the per-window sync costs <10%, median-of-5 robust to load spikes
        "--bench-steps", "3000",
        "--warmup-steps", "300",
        # lr/warmup tuned for H=512 (docs/PERFORMANCE.md) so the reported
        # train_bpc reflects real learning during the benchmark window
        "--lr", "0.02",
        "--warmup", "20",
        # host-streamed windows: the in-jit (S+1, B) byte gather costs ~21%
        # of the step (XLA lowers it per-element); the feeder builds windows
        # on the host and ships them double-buffered (data/streaming.py)
        "--stream-data",
    ]
    args = build_parser().parse_args(argv)
    args.bpc_band = BPC_BAND
    try:
        result = run_benchmark(args)
    except Exception as e:  # noqa: BLE001 — one JSON line, never a bare traceback
        _error_line(f"{type(e).__name__}: {str(e)[:400]}")
        raise SystemExit(1)
    print(json.dumps(result), flush=True)
    if not result.get("train_bpc_ok", True):
        # fail loudly on a silent math regression that preserves throughput
        # (train_bpc outside the sanity band) — after printing the JSON line
        print(
            f"train_bpc {result['train_bpc']} outside sanity band "
            f"{args.bpc_band}",
            file=sys.stderr,
        )
        raise SystemExit(1)


if __name__ == "__main__":
    main()
