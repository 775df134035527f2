#!/usr/bin/env python
"""Piecewise device profile of one training step: fwd-only, fwd+bwd, and the
full superstep (fwd+bwd+Adagrad+window/cursor) are each timed as K-iteration
jitted scans so per-call dispatch overhead over the axon tunnel amortizes
away. The differences localize the step's time between the recurrence
forward, BPTT, and the optimizer/update epilogue — the rebuild's analogue of
the reference's per-phase wall-clock prints (``class_CUDA/lstm.cc:339-376``).

Usage: python -u scripts/profile_step.py --hidden 512 --batch 128 --seq 100 \
           --dtype bfloat16 [--backend auto|xla] [--steps 400]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=100)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--loss-mode", default="all", choices=["all", "last"])
    ap.add_argument("--residual-dtype", default="auto")
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--steps", type=int, default=400, help="timed inner steps")
    ap.add_argument("--superstep", type=int, default=10)
    ap.add_argument("--data", default=f"{ROOT}/data/enwik6.txt")
    args = ap.parse_args()

    from eigen_lstm_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from eigen_lstm_tpu import DataConfig, ModelConfig, TrainConfig
    from eigen_lstm_tpu.data import corpus as corpus_mod
    from eigen_lstm_tpu.models import lstm as model
    from eigen_lstm_tpu.ops.dispatch import select_cell_fn
    from eigen_lstm_tpu.train import metrics as metrics_mod
    from eigen_lstm_tpu.train.trainer import Trainer

    mcfg = ModelConfig(
        hidden=args.hidden, num_layers=args.layers, loss_mode=args.loss_mode,
        compute_dtype=args.dtype, residual_dtype=args.residual_dtype, seed=0,
    )
    dcfg = DataConfig(path=args.data, train_percent=0.99, batch=args.batch,
                      seq=args.seq)
    tcfg = TrainConfig(lr=0.02, warmup_steps=100, superstep=args.superstep,
                       eval_every_s=1e9)
    train, _ = corpus_mod.load_dataset(dcfg)
    cell_fn = select_cell_fn(args.backend, mcfg, dcfg.batch)
    tr = Trainer(mcfg, dcfg, tcfg, train, None, cell_fn=cell_fn)
    corpus = tr.corpus
    length = int(corpus.shape[0])
    stride = dcfg.effective_stride
    seq = dcfg.seq
    k_steps = args.superstep

    def fwd_inner(carry, _):
        h, c, pos = carry
        x, t = corpus_mod.make_windows(corpus, pos, seq)
        loss, ((h2, c2), bits) = model.loss_fn(
            tr.state.params, x, t, h, c, mcfg, cell_fn
        )
        pos2, _ = corpus_mod.advance_positions(pos, stride, length, seq)
        return (h2.astype(h.dtype), c2.astype(c.dtype), pos2), bits

    @jax.jit
    def fwd_scan(h, c, pos):
        (_, _, pos), bits = jax.lax.scan(
            fwd_inner, (h, c, pos), None, length=k_steps
        )
        return jnp.sum(bits), pos

    def grad_inner(carry, _):
        h, c, pos, acc = carry
        x, t = corpus_mod.make_windows(corpus, pos, seq)
        (loss, ((h2, c2), bits)), grads = jax.value_and_grad(
            model.loss_fn, has_aux=True
        )(tr.state.params, x, t, h, c, mcfg, cell_fn)
        # fold one scalar per grad leaf into the carry so BPTT survives DCE
        gsum = sum(jnp.sum(g[..., 0]) for g in jax.tree_util.tree_leaves(grads))
        pos2, _ = corpus_mod.advance_positions(pos, stride, length, seq)
        return (h2.astype(h.dtype), c2.astype(c.dtype), pos2, acc + gsum), bits

    @jax.jit
    def grad_scan(h, c, pos):
        (_, _, pos, acc), bits = jax.lax.scan(
            grad_inner, (h, c, pos, jnp.float32(0)), None, length=k_steps
        )
        return jnp.sum(bits) + acc, pos

    def timed(tag, fn, *fn_args, reps=None):
        reps = reps or max(1, args.steps // k_steps)
        out = fn(*fn_args)          # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*fn_args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        us = dt / (reps * k_steps) * 1e6
        print(f"{tag:<28s} {us:10.1f} us/step", flush=True)
        return us

    h, c, pos = tr.state.h, tr.state.c, tr.state.positions
    us_fwd = timed("forward only", fwd_scan, h, c, pos)
    us_grad = timed("forward+backward", grad_scan, h, c, pos)

    def run_super(state):
        state, m = tr.superstep(state)
        return state, m

    reps = max(1, args.steps // k_steps)
    state, m = run_super(tr.state)
    jax.block_until_ready(m["bits_mean"])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = run_super(state)
    jax.block_until_ready(m["bits_mean"])
    us_full = (time.perf_counter() - t0) / (reps * k_steps) * 1e6
    print(f"{'full train step':<28s} {us_full:10.1f} us/step", flush=True)

    fpc = metrics_mod.lstm_flops_per_char(mcfg)
    chars = dcfg.batch * stride
    peak = (metrics_mod.TPU_V5E_PEAK_BF16 if args.dtype == "bfloat16"
            else metrics_mod.TPU_V5E_PEAK_FP32)
    print(f"\nbackend={'pallas' if cell_fn else 'xla'} "
          f"chars/step={chars} model-GFLOP/step={fpc * chars / 1e9:.1f}")
    for tag, us in (("fwd", us_fwd), ("bwd (delta)", us_grad - us_fwd),
                    ("update (delta)", us_full - us_grad),
                    ("full", us_full)):
        print(f"  {tag:<16s} {us:8.1f} us", flush=True)
    print(f"  MFU(full) = {fpc * chars / (us_full * 1e-6) / peak:6.1%}")
    # rough speed-of-light decomposition: fwd model FLOPs are 1/3 of total
    print(f"  SOL(all-MXU) = {fpc * chars / peak * 1e6:8.1f} us")


if __name__ == "__main__":
    main()
