#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line.

Headline config per BASELINE.json: 1-layer char LSTM, hidden 512, batch 128,
seq 100, segment-mode training on enwik6, bf16 matmul / fp32 accum, on one
TPU chip. ``vs_baseline`` is the speedup over the single-core Eigen+BLAS
reference normalized by the analytic FLOP model (see
eigen_lstm_tpu/bench.py for methodology; north star is ≥50x).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
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
    result = run_benchmark(args)
    print(json.dumps(result), flush=True)
    if not result.get("train_bpc_ok", True):
        # fail loudly on a silent math regression that preserves throughput
        # (train_bpc outside the sanity band) — after printing the JSON line
        print(
            f"train_bpc {result['train_bpc']} outside sanity band (1.5, 4.5)",
            file=sys.stderr,
        )
        raise SystemExit(1)


if __name__ == "__main__":
    main()
