#!/usr/bin/env python
"""Measure the five BASELINE.json configs (where single-chip-runnable) and
append BENCHMARKS.md. Configs:

1. PR1 ref: H=128 S=25 B=1 fp32 on alice29 (correctness config — B=1 leaves
   the MXU idle by design, SURVEY.md §7)
2. Batched: H=256 B=32 S=50 on a Canterbury text (reference used shakespeare,
   which is not shipped; asyoulik.txt is the same genre)
3. Headline: H=512 B=128 S=100 bf16 on enwik6 (repo-root bench.py)
4. Stacked: 3-layer H=1024 bf16 B=64 S=100 on enwik6 (per-layer fused cells)
5. DP H=2048: multi-chip — dry-run-compiled on a virtual mesh (the box has
   one chip); single-chip H=2048 B=64 throughput measured as the per-chip
   datapoint.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure(tag, mcfg_kw, dcfg_kw, steps=400, superstep=10, eval_chars=50000,
            lr=0.1, warmup=0):
    import jax

    from eigen_lstm_tpu import DataConfig, ModelConfig, TrainConfig
    from eigen_lstm_tpu.data import corpus as corpus_mod
    from eigen_lstm_tpu.ops.dispatch import select_cell_fn
    from eigen_lstm_tpu.train import metrics as metrics_mod
    from eigen_lstm_tpu.train.trainer import Trainer
    from eigen_lstm_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    mcfg = ModelConfig(**mcfg_kw)
    dcfg = DataConfig(**dcfg_kw)
    tcfg = TrainConfig(lr=lr, warmup_steps=warmup, superstep=superstep,
                       eval_every_s=1e9, eval_chars=eval_chars)
    train, test = corpus_mod.load_dataset(dcfg)
    cell_fn = select_cell_fn("auto", mcfg, dcfg.batch)
    # host-streamed windows (the production fast path: the in-jit byte
    # gather costs ~21% of a step, docs/PERFORMANCE.md round 2c)
    tr = Trainer(mcfg, dcfg, tcfg, train, test, cell_fn=cell_fn, streaming=True)
    # compile + warm
    tr.state, m = tr.dispatch_superstep()
    jax.block_until_ready(m["bits_mean"])
    n_super = max(1, steps // superstep)
    t0 = time.perf_counter()
    for _ in range(n_super):
        tr.state, m = tr.dispatch_superstep()
    jax.block_until_ready(m["bits_mean"])
    dt = time.perf_counter() - t0
    chars = n_super * tr.chars_per_superstep()
    cps = chars / dt
    fpc = metrics_mod.lstm_flops_per_char(mcfg)
    res = {
        "config": tag,
        "hidden": mcfg.hidden,
        "layers": mcfg.num_layers,
        "batch": dcfg.batch,
        "seq": dcfg.seq,
        "dtype": mcfg.compute_dtype,
        "backend": "pallas" if cell_fn else "xla",
        "chars_per_sec": round(cps, 0),
        "gflops": round(cps * fpc / 1e9, 1),
        "mfu": round(cps * fpc / (
            metrics_mod.TPU_V5E_PEAK_BF16
            if mcfg.compute_dtype == "bfloat16"
            else metrics_mod.TPU_V5E_PEAK_FP32
        ), 4),
        "train_bpc": round(float(m["bits_mean"]), 3),
    }
    print(json.dumps(res), flush=True)
    return res


def main():
    rows = []
    rows.append(measure(
        "1. PR1-ref (correctness)",
        dict(hidden=128, num_layers=1, loss_mode="all", seed=0),
        dict(path=f"{ROOT}/data/alice29.txt", train_percent=0.95, batch=1, seq=25),
        steps=300, superstep=50,
    ))
    rows.append(measure(
        "2. batched",
        dict(hidden=256, num_layers=1, loss_mode="all", seed=0),
        dict(path=f"{ROOT}/data/cantrbry/asyoulik.txt", train_percent=0.95, batch=32, seq=50),
        steps=400, superstep=20,
    ))
    rows.append(measure(
        "3. headline",
        dict(hidden=512, num_layers=1, loss_mode="all", compute_dtype="bfloat16", seed=0),
        dict(path=f"{ROOT}/data/enwik6.txt", train_percent=0.99, batch=128, seq=100),
        steps=400, superstep=10, lr=0.02, warmup=100,
    ))
    rows.append(measure(
        "4. stacked 3x1024 bf16",
        dict(hidden=1024, num_layers=3, loss_mode="all", compute_dtype="bfloat16",
             residual_dtype="bfloat16", seed=0),
        dict(path=f"{ROOT}/data/enwik6.txt", train_percent=0.99, batch=64, seq=100),
        steps=200, superstep=10, lr=0.02, warmup=100,
    ))
    rows.append(measure(
        "5. H=2048 single-chip shard (DP validated on virtual mesh)",
        dict(hidden=2048, num_layers=1, loss_mode="all", compute_dtype="bfloat16",
             residual_dtype="bfloat16", seed=0),
        dict(path=f"{ROOT}/data/enwik6.txt", train_percent=0.99, batch=64, seq=50),
        steps=800, superstep=10, lr=0.005, warmup=200,
    ))
    rows.append(measure(
        "5b. H=2048 full-batch single chip",
        dict(hidden=2048, num_layers=1, loss_mode="all", compute_dtype="bfloat16",
             residual_dtype="bfloat16", seed=0),
        dict(path=f"{ROOT}/data/enwik6.txt", train_percent=0.99, batch=128, seq=100),
        steps=400, superstep=10, lr=0.005, warmup=200,
    ))

    rows.append(measure(
        "8. long-context S=1000 (10x the reference's max window)",
        dict(hidden=512, num_layers=1, loss_mode="all", compute_dtype="bfloat16",
             residual_dtype="bfloat16", seed=0),
        dict(path=f"{ROOT}/data/enwik6.txt", train_percent=0.99, batch=128,
             seq=1000),
        steps=40, superstep=5, lr=0.02, warmup=10,
    ))

    # reference-corpora rows (SURVEY.md §6 grid: world192 + book1 at the
    # reference's GPU config N=256 S=25 B=16, lstm_eigen_class_CUDA)
    rows.append(measure(
        "6. world192 (ref GPU cfg)",
        dict(hidden=256, num_layers=1, loss_mode="last", compute_dtype="bfloat16", seed=0),
        dict(path=f"{ROOT}/data/world192.txt", train_percent=0.99, batch=16, seq=25, stride=1),
        steps=2000, superstep=100, lr=0.1, warmup=100,
    ))
    rows.append(measure(
        "7. book1 (ref GPU cfg)",
        dict(hidden=256, num_layers=1, loss_mode="last", compute_dtype="bfloat16", seed=0),
        dict(path=f"{ROOT}/data/book1.txt", train_percent=0.95, batch=16, seq=25, stride=1),
        steps=2000, superstep=100, lr=0.1, warmup=100,
    ))

    lines = [
        "# BENCHMARKS — BASELINE.json configs on one TPU v5e chip",
        "",
        "| config | backend | chars/sec | GFLOP/s (analytic) | MFU | notes |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['config']} (L{r['layers']} H{r['hidden']} B{r['batch']} "
            f"S{r['seq']} {r['dtype']}) | {r['backend']} | {r['chars_per_sec']:,.0f} "
            f"| {r['gflops']:,.1f} | {r['mfu']:.1%} | train bpc {r['train_bpc']} |"
        )
    lines += [
        "",
        "All single-chip rows use the host-streamed window feeder (the",
        "in-jit byte gather costs ~21% of a small-model step,",
        "docs/PERFORMANCE.md round 2c). MFU uses the corrected analytic",
        "model (no layer-0 dgrad; gather embedding counts zero fwd FLOPs)",
        "against the peak of the run's compute dtype. Rows 6-7 are the",
        "reference's own GPU config (N=256 S=25 B=16, sliding windows,",
        "loss-on-last) on the mirrored world192/book1 corpora (SURVEY.md §6).",
        "Config 2 (fp32) pins Precision.HIGHEST (three-pass MXU): XLA's",
        "default would execute fp32 matmuls at bf16 precision — use",
        "--dtype bfloat16 for throughput (docs/PERFORMANCE.md).",
        "Config 5 is the per-chip shard of BASELINE config 5 (global B=512",
        "over v5e-8 -> B=64/chip): at B=64 the step is bound by streaming",
        "the 32 MB U through the tiled-embed kernel — weight-stream roofline",
        "~36% MFU at this batch (docs/PERFORMANCE.md). Row 5b is the same",
        "model with the chip's MXU-balanced batch (B=128 S=100): 95% of its",
        "~60%-MFU roofline. The 8-chip DP version of row 5 is",
        "compile+execute validated on an 8-device virtual mesh",
        "(`__graft_entry__.dryrun_multichip`, tests/test_parallel.py); this",
        "box has a single physical chip.",
        "Row 8 is the long-context axis: BPTT windows 10x the reference's",
        "longest (S=100); throughput is flat in S past 1000 (S=5000 measured",
        "identically at 10.7M chars/s) — per-char stream traffic is",
        "S-independent under the scan + per-step Pallas residual streams.",
        "Reference baselines (BASELINE.md): 4 GFLOP/s CPU, 62-750 GFLOP/s GPU.",
    ]
    with open(os.path.join(ROOT, "BENCHMARKS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote BENCHMARKS.md", flush=True)


if __name__ == "__main__":
    main()
