#!/usr/bin/env python
"""A/B the S=1000 long-context MFU levers on one chip.

Round 2 measured the H=512 B=128 S=1000 row at 44-48% MFU vs 64-67% at
S=100 and diagnosed the step-down as the BPTT residual working set
(docs/PERFORMANCE.md round 2d).  Round 3 shipped two levers:

* ``scan_chunk`` — rematerialize the recurrence in chunks, shrinking the
  live residual streams S/chunk-fold (config.py scan_chunk);
* ``residual_dtype=bfloat16`` — halve residual bytes.

This script measures the cross product on the real chip and appends a
JSON line per variant to ``artifacts/longctx_ab.jsonl``.  Judge item:
VERDICT round 2 "do this" #7 (target: S=1000 >= 55% MFU).
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure(scan_chunk, residual_dtype, steps=40, superstep=4):
    import jax

    from eigen_lstm_tpu import DataConfig, ModelConfig, TrainConfig
    from eigen_lstm_tpu.data import corpus as corpus_mod
    from eigen_lstm_tpu.ops.dispatch import select_cell_fn
    from eigen_lstm_tpu.train import metrics as metrics_mod
    from eigen_lstm_tpu.train.trainer import Trainer
    from eigen_lstm_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    mcfg = ModelConfig(hidden=512, compute_dtype="bfloat16",
                       residual_dtype=residual_dtype, scan_chunk=scan_chunk)
    dcfg = DataConfig(path=os.path.join(ROOT, "data", "enwik6.txt"),
                      batch=128, seq=1000)
    tcfg = TrainConfig(lr=0.02, warmup_steps=100, superstep=superstep,
                       eval_every_s=1e9)
    train, test = corpus_mod.load_dataset(dcfg)
    cell_fn = select_cell_fn("auto", mcfg, dcfg.batch)
    tr = Trainer(mcfg, dcfg, tcfg, train, test, cell_fn=cell_fn,
                 streaming=True)
    tr.state, m = tr.dispatch_superstep()          # compile + warm
    jax.block_until_ready(m["bits_mean"])
    n_super = max(1, steps // superstep)
    # median of 3 windows (the robust-bench pattern, bench.py)
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_super):
            tr.state, m = tr.dispatch_superstep()
        jax.block_until_ready(m["bits_mean"])
        windows.append(time.perf_counter() - t0)
    dt = sorted(windows)[1]
    chars = n_super * tr.chars_per_superstep()
    meter = metrics_mod.ThroughputMeter(mcfg)
    cps, gflops, mfu = meter.rates(chars, dt)
    return {"scan_chunk": scan_chunk, "residual_dtype": residual_dtype,
            "chars_per_sec": round(cps), "gflops": round(gflops, 1),
            "mfu": round(mfu, 4),
            "train_bpc": round(float(m["bits_mean"]), 4)}


def main():
    out = os.path.join(ROOT, "artifacts", "longctx_ab.jsonl")
    rows = []
    for chunk, rdt in itertools.product((0, 125, 250),
                                        ("float32", "bfloat16")):
        r = measure(chunk, rdt)
        rows.append(r)
        print(json.dumps(r), flush=True)
        with open(out, "a") as f:
            f.write(json.dumps(r) + "\n")
    best = max(rows, key=lambda r: r["mfu"])
    print("best:", json.dumps(best))


if __name__ == "__main__":
    main()
