#!/usr/bin/env python
"""GEMM timing micro-benchmark — the rebuild's analogue of the reference's
``test_cublas`` (``lstm_eigen_CUDA/lstm.cu:835-873``: times cuBLAS vs Eigen
on the training GEMM shapes and prints max/mean error + GFLOP/s).

Times the three GEMM families of the training step at the headline and
large-model shapes, checks each against a float64 oracle, and reports
achieved GFLOP/s + fraction of the chip's matmul peak.

Run on TPU:  python -u scripts/gemm_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_gemm(name, m, k, n, dtype, reps=50):
    from eigen_lstm_tpu.ops.cell import matmul
    from eigen_lstm_tpu.train.metrics import TPU_V5E_PEAK_BF16, TPU_V5E_PEAK_FP32

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    f = jax.jit(lambda a, b: matmul(a, b, dtype))
    out = f(a, b)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(a, b)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    gfs = 2.0 * m * k * n / dt / 1e9
    peak = TPU_V5E_PEAK_BF16 if dtype == jnp.bfloat16 else TPU_V5E_PEAK_FP32
    # accuracy vs float64 oracle (the reference prints max/mean error)
    oracle = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    rel = np.abs(np.asarray(out, np.float64) - oracle) / np.sqrt(
        np.mean(oracle**2)
    )
    print(
        f"{name:42s} {m:>6d}x{k:>5d}x{n:>5d} {jnp.dtype(dtype).name:9s} "
        f"{dt*1e6:9.1f} us {gfs:10,.0f} GF/s {gfs*1e9/peak:6.1%} peak  "
        f"maxerr {rel.max():.2e}",
        flush=True,
    )


def main():
    from eigen_lstm_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    s, b = 100, 128
    for n, dt in ((512, jnp.bfloat16), (2048, jnp.bfloat16), (512, jnp.float32)):
        # the three GEMM families of a training step (SURVEY.md §3.1):
        # hoisted input projection, per-step recurrence, weight gradient
        bench_gemm("xw: (S*B, M) @ (M, 4N) input proj", s * b, 256, 4 * n, dt)
        bench_gemm("hU: (B, N) @ (N, 4N) per-step recurrence", b, n, 4 * n, dt)
        bench_gemm("dU: (N, S*B) @ (S*B, 4N) weight grad", n, s * b, 4 * n, dt)


if __name__ == "__main__":
    main()
