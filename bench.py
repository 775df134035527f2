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
        "--superstep", "10",
        "--bench-steps", "600",
        "--warmup-steps", "100",
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


if __name__ == "__main__":
    main()
