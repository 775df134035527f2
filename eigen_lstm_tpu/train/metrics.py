"""Throughput instrumentation: analytic FLOP model, timer, results table.

Reference counterparts:
* analytic FLOP model ``count_flops`` (``class_CUDA/lstm.cc:722-747``) used
  for the GFLOP/s figures in every benchmark log (BASELINE.md);
* ``Timer`` stopwatch (``timer.h:15-48``);
* results matrix appended one row per eval and saved to disk — 7-col CPU
  format ``(idx, epoch-frac, iterations, wall-time, train-bpc, test-bpc,
  gflops)`` (``class_batch/lstm.cc:218-226``), 5-col GPU format
  (``class_CUDA/lstm.cc:205-211``).

The rebuild reports the same analytic GFLOP/s (so numbers are comparable to
the reference logs) plus chars/sec and model-FLOP utilization (MFU) against
the chip's peak — the TPU-native headline metric.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import List, Optional

from ..config import ModelConfig

# bf16 peak of one TPU v5e (lite) chip, FLOP/s — for MFU reporting.
TPU_V5E_PEAK_BF16 = 197e12
TPU_V5E_PEAK_FP32 = 49e12


def lstm_flops_per_char(cfg: ModelConfig, loss_mode: Optional[str] = None) -> float:
    """Analytic forward+backward+update FLOPs per trained character, per
    stream. Mirrors the intent of the reference's ``count_flops``
    (``class_CUDA/lstm.cc:722-747``): GEMMs dominate; train = fwd + bwd where
    bwd costs ~2x fwd matmul FLOPs (each forward GEMM spawns a dgrad and a
    wgrad GEMM in BPTT).

    Counted per timestep per stream (the reference divides by iterations*B):
      fwd:  2*(in_dim*4N) [x@W] + 2*(N*4N) [h@U] + ~40N eltwise
      head: 2*(N*M) + ~8M softmax  (only on loss-bearing steps)
      bwd:  2x the above matmul FLOPs — EXCEPT layer 0's input GEMM, which
      has no dgrad (the inputs are byte ids, nothing propagates below), and
      whose fwd counts as zero model-FLOPs in gather-embedding modes
      ("auto"/"gather": x@W is a column gather of W, SURVEY.md §2.2 — the
      kernels may still spend MXU cycles one-hot-multiplying, but those are
      not *model* FLOPs and must not inflate MFU).
    Adagrad adds ~8 FLOPs per parameter per *step* — amortized per char by
    the caller if desired (negligible at S>=25).
    """
    n, m = cfg.hidden, cfg.vocab
    mode = loss_mode or cfg.loss_mode
    total = 0.0
    for l in range(cfg.num_layers):
        in_dim = m if l == 0 else n
        gemm_x = 2.0 * in_dim * 4 * n
        gemm_h = 2.0 * n * 4 * n
        if l == 0:
            # wgrad always; fwd only when the embedding is a real matmul
            x_mult = 2.0 if cfg.embedding_mode == "onehot" else 1.0
        else:
            x_mult = 3.0  # fwd + dgrad + wgrad
        total += x_mult * gemm_x + 3.0 * gemm_h + 40.0 * n
    head = 2.0 * n * m + 8.0 * m
    if mode == "all":
        total += 3.0 * head
    # "last" mode: head cost amortized over S chars — caller handles; keep
    # the conservative per-char count without the head.
    return total


def param_count(cfg: ModelConfig) -> int:
    n, m = cfg.hidden, cfg.vocab
    total = 0
    for l in range(cfg.num_layers):
        in_dim = m if l == 0 else n
        total += in_dim * 4 * n + n * 4 * n + 4 * n
    total += n * m + m
    return total


class Timer:
    """Wall-clock stopwatch (reference ``timer.h:22-42``)."""

    def __init__(self):
        self.start()

    def start(self):
        self._t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0


@dataclass
class ResultRow:
    """One eval-interval row — superset of the reference's 7-col CPU /
    5-col GPU formats (SURVEY.md §5 logging)."""

    idx: int
    step: int
    chars_trained: int
    wall_s: float
    train_bpc: float
    test_bpc: float
    gflops: float
    chars_per_sec: float
    mfu: float


@dataclass
class ResultsTable:
    """Appended one row per eval and flushed to disk, like the reference's
    results matrix (``class_batch/lstm.cc:218-240``). Serialized as JSONL
    (plus a reference-style whitespace table for eyeballing)."""

    path: Optional[str] = None
    rows: List[ResultRow] = field(default_factory=list)

    def append(self, row: ResultRow):
        self.rows.append(row)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(row.__dict__) + "\n")

    def last(self) -> Optional[ResultRow]:
        return self.rows[-1] if self.rows else None


@dataclass
class ThroughputMeter:
    """Live chars/sec + analytic GFLOP/s + MFU between report points
    (reference live meter, ``class_batch/lstm.cc:246-267``). The MFU
    denominator follows the compute dtype: bf16 matmuls rate against the
    bf16 MXU peak, fp32/fp64 against the fp32 peak."""

    cfg: ModelConfig
    peak_flops: Optional[float] = None

    def __post_init__(self):
        if self.peak_flops is None:
            self.peak_flops = (
                TPU_V5E_PEAK_BF16
                if self.cfg.compute_dtype == "bfloat16"
                else TPU_V5E_PEAK_FP32
            )

    def rates(self, chars: int, seconds: float):
        cps = chars / max(seconds, 1e-9)
        flops = cps * lstm_flops_per_char(self.cfg)
        return cps, flops / 1e9, flops / self.peak_flops
