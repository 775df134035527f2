"""Throughput benchmark: chars/sec + analytic GFLOP/s vs the reference
baseline (BASELINE.md; driver contract: repo-root ``bench.py`` prints one
JSON line).

Methodology. The metric is trained chars/sec in segment mode (stride = S:
every character is trained exactly once per pass, matching the rebuild
north-star config). The reference baseline for ``vs_baseline`` is the
single-core Eigen+BLAS path measured at ~4.0 GFLOP/s sustained
(``lstm_eigen_class_batch/enwik8_small_cpu_1pc.txt`` col 7, BASELINE.md):
baseline chars/sec at any model size = 4.0e9 / flops_per_trained_char, using
the same analytic FLOP model for both sides (``metrics.lstm_flops_per_char``,
mirroring the reference's ``count_flops``, ``class_CUDA/lstm.cc:722-747``).
"""

from __future__ import annotations

import time
from typing import Any, Dict

import jax
import numpy as np

EIGEN_BLAS_GFLOPS = 4.0  # measured single-core reference throughput


def run_benchmark(args) -> Dict[str, Any]:
    """Benchmark the jitted training superstep. ``args`` is the CLI
    namespace (see cli.py bench subcommand)."""

    from .cli import _configs
    from .data import corpus as corpus_mod
    from .ops.dispatch import select_cell_fn
    from .train import metrics as metrics_mod
    from .train.trainer import Trainer

    mcfg, dcfg, tcfg = _configs(args)
    train, _ = corpus_mod.load_dataset(dcfg)
    cell_fn = select_cell_fn(args.backend, mcfg, dcfg.batch)
    streaming = bool(getattr(args, "stream_data", False))
    trainer = Trainer(
        mcfg, dcfg, tcfg, train, None, cell_fn=cell_fn, streaming=streaming
    )

    warmup = max(1, args.warmup_steps // tcfg.superstep)
    n_windows = max(1, int(getattr(args, "bench_windows", 5)))
    steps = max(1, args.bench_steps // tcfg.superstep // n_windows)

    for _ in range(warmup):
        trainer.state, metrics = trainer.dispatch_superstep()
    jax.block_until_ready(metrics["bits_mean"])

    # k independent timing windows, median-of-k: a single window is exposed
    # to tunnel/host load spikes (observed 7% swings between sessions,
    # VERDICT r2 weak #1); the median is robust to one slow window
    window_cps = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            trainer.state, metrics = trainer.dispatch_superstep()
        jax.block_until_ready(metrics["bits_mean"])
        dt = time.perf_counter() - t0
        window_cps.append(steps * trainer.chars_per_superstep() / dt)
    cps = float(np.median(window_cps))
    fpc = metrics_mod.lstm_flops_per_char(mcfg)
    gflops = cps * fpc / 1e9
    peak = (
        metrics_mod.TPU_V5E_PEAK_BF16
        if mcfg.compute_dtype == "bfloat16"
        else metrics_mod.TPU_V5E_PEAK_FP32
    )
    mfu = cps * fpc / peak
    # the reference's 4.0 GFLOP/s was achieved executing the dense one-hot
    # embedding GEMM, so its chars/s at this config follows from the
    # onehot-mode FLOP count, not the gather-mode model FLOPs
    import dataclasses as _dc

    fpc_ref = metrics_mod.lstm_flops_per_char(
        _dc.replace(mcfg, embedding_mode="onehot")
    )
    baseline_cps = EIGEN_BLAS_GFLOPS * 1e9 / fpc_ref
    train_bpc = float(metrics["bits_mean"])
    # sanity band: after the benchmark's ~1k real training steps this config
    # sits near 3.3-3.5 bpc (r01 3.34, r02 3.50); a silent math regression
    # that keeps throughput shows up as ~8 bpc (uniform) or non-finite.
    # Callers (repo-root bench.py) exit nonzero when this is False.
    bpc_lo, bpc_hi = getattr(args, "bpc_band", (1.5, 4.5))
    bpc_ok = bool(np.isfinite(train_bpc) and bpc_lo <= train_bpc <= bpc_hi)
    return {
        "metric": f"train_chars_per_sec H={mcfg.hidden} B={dcfg.batch} S={dcfg.seq} {mcfg.compute_dtype}",
        "value": round(cps, 1),
        "unit": "chars/sec/chip",
        "vs_baseline": round(cps / baseline_cps, 2),
        "gflops": round(gflops, 1),
        "mfu": round(mfu, 4),
        "train_bpc": round(train_bpc, 4),
        "train_bpc_ok": bpc_ok,
        "windows_mchars_per_sec": [round(w / 1e6, 2) for w in window_cps],
        "platform": jax.devices()[0].platform,
    }
