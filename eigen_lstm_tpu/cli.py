"""CLI entry point — the runtime config/flag system the reference lacks
(hyperparameters are hardcoded ``const size_t`` in main(),
``class_CUDA/lstm.cc:56-75``; SURVEY.md §5 mandates a typed config + CLI).

Usage:
  python -m eigen_lstm_tpu.cli train  --data PATH [--hidden 512 --batch 128 ...]
  python -m eigen_lstm_tpu.cli sample --ckpt ckpt.npz --data PATH [--length 1000]
  python -m eigen_lstm_tpu.cli eval   --ckpt ckpt.npz --data PATH
  python -m eigen_lstm_tpu.cli bench  --data PATH [--hidden 512 ...]
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--layers", type=int, default=1)
    p.add_argument("--vocab", type=int, default=256)
    p.add_argument("--cell", choices=["reference", "standard"], default="reference")
    p.add_argument("--loss-mode", choices=["last", "all"], default="all")
    p.add_argument("--loss-base", choices=["e", "2"], default="e")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32",
                   help="matmul compute dtype (params stay fp32)")
    p.add_argument("--residual-dtype", choices=["auto", "float32", "bfloat16"],
                   default="auto",
                   help="storage dtype of saved BPTT residuals (h/c/g "
                        "sequences). auto: bfloat16 under --dtype bfloat16 "
                        "when hidden >= 2048 (tiled-kernel VMEM budget) or "
                        "seq >= 512 (long-window residual streams), "
                        "float32 otherwise")
    p.add_argument("--forget-bias", type=float, default=1.0)
    p.add_argument("--scan-chunk", type=int, default=0,
                   help="long-window residual tiling: rematerialize the "
                        "recurrence in chunks of this many steps (must "
                        "divide --seq; 0 = off). Shrinks the BPTT residual "
                        "working set for S >= 1000 windows "
                        "(docs/PERFORMANCE.md long-context)")
    p.add_argument("--dropout", type=float, default=0.0,
                   help="inter-layer + pre-head dropout rate (training only; "
                        "the reference has no regularization — rebuild "
                        "extension for held-out quality on small corpora)")
    p.add_argument("--tie-embeddings", action="store_true",
                   help="share the softmax head Why^T as the input embedding "
                        "(layer 0 gets an (N, 4N) projection; rebuild "
                        "regularization extension — see ModelConfig)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--embedding", choices=["auto", "gather", "onehot"], default="auto",
                   help="layer-0 W-x path: auto = gather fwd + one-hot-GEMM bwd")
    p.add_argument("--backend", choices=["auto", "xla", "pallas"], default="auto",
                   help="recurrence backend: fused Pallas kernel or XLA scan")
    p.add_argument("--dp", type=int, default=None, metavar="N",
                   help="data-parallel over N devices (shard_map+psum mesh; "
                        "global --batch is split across them)")
    p.add_argument("--tp", type=int, default=None, metavar="N",
                   help="tensor-parallel over N devices (gate-sharded "
                        "weights; --hidden must divide by N). Combine with "
                        "--dp for a 2-D (data x model) mesh")
    p.add_argument("--sp", type=int, default=None, metavar="N",
                   help="sequence-pipeline the BPTT window over N devices "
                        "(time segments, batch microchunks of --pp-chunks; "
                        "parallel/sp.py)")
    p.add_argument("--pp", type=int, default=None, metavar="N",
                   help="pipeline-parallel over N stages (--layers must "
                        "divide by N; sequence chunked by --pp-chunks)")
    p.add_argument("--pp-chunks", type=int, default=4,
                   help="pipeline microbatch chunks (must divide --seq)")


def _add_data_args(p: argparse.ArgumentParser):
    p.add_argument("--data", required=True, help="byte corpus path")
    p.add_argument("--train-percent", type=float, default=0.95)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seq", type=int, default=100)
    p.add_argument("--stride", type=int, default=None,
                   help="cursor stride (default: seq, i.e. segment mode; 1 = sliding)")
    p.add_argument("--no-carry", action="store_true",
                   help="reset h/c each window instead of carrying")
    p.add_argument("--reset-std", type=float, default=0.0)
    p.add_argument("--stream-data", dest="stream_data", action="store_true",
                   default=None,
                   help="keep the corpus on the host (mmap) and feed windows "
                        "per superstep, double-buffered (data/streaming.py). "
                        "Default for single-device runs: the in-jit byte "
                        "gather costs ~21%% of a step (docs/PERFORMANCE.md) "
                        "and it scales to corpora that rival HBM")
    p.add_argument("--resident-data", dest="stream_data", action="store_false",
                   help="force the device-resident corpus with in-jit window "
                        "gathers (the default for mesh runs; --stream-data "
                        "works for every parallel mode)")


def _add_train_args(p: argparse.ArgumentParser):
    p.add_argument("--lr", type=float, default=None,
                   help="default auto: 0.1 below hidden 512 (the reference's "
                        "lr, root lstm.cc:59); 0.02 at hidden >= 512 where "
                        "lr=0.1 stalls; 0.005 for stacks or hidden >= 1024 "
                        "where 0.02 stalls too (measured sweeps, "
                        "docs/PERFORMANCE.md)")
    p.add_argument("--adagrad-eps", type=float, default=1e-10)
    p.add_argument("--clip-norm", type=float, default=None)
    p.add_argument("--warmup", type=int, default=None,
                   help="lr=0 warmup steps while Adagrad m accumulates; "
                        "default min(50*seq, steps//10) — the reference's "
                        "50*seq recipe (class_CUDA/lstm.cc:364-367) capped "
                        "so short runs still train")
    p.add_argument("--lr-cycle-steps", type=int, default=0,
                   help="post-warmup cyclical lr: within each cycle of this "
                        "many steps, lr decays linearly to "
                        "lr*--lr-cycle-min-frac then resets (SWA's cyclic "
                        "schedule; 0 disables)")
    p.add_argument("--lr-cycle-min-frac", type=float, default=0.1)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--epochs", type=float, default=None,
                   help="train this many passes over the corpus instead of "
                        "--steps (the reference's epoch loop, root lstm.cc:142)")
    p.add_argument("--superstep", type=int, default=50)
    p.add_argument("--log-every", type=int, default=500)
    p.add_argument("--eval-every-s", type=float, default=60.0)
    p.add_argument("--eval-chars", type=int, default=100000)
    p.add_argument("--sample-chars", type=int, default=1000)
    p.add_argument("--ckpt-dir", type=str, default=None)
    p.add_argument("--results", type=str, default=None,
                   help="JSONL results-table path")
    p.add_argument("--resume", type=str, default=None, help="checkpoint to resume")
    p.add_argument("--keep-snapshots", action="store_true",
                   help="retain ckpt_step{N}.npz at every timed eval "
                        "(material for tail weight averaging, scripts/swa.py)")
    p.add_argument("--gradcheck", action="store_true",
                   help="run a numerical gradient check before training "
                        "(reference runs one per epoch, class_batch/lstm.cc:323-337)")
    p.add_argument("--gradcheck-every", type=int, default=None, metavar="K",
                   help="every K supersteps, run the finite-difference "
                        "gradient oracle on the live training point against "
                        "the active backend's backward (the reference's "
                        "per-epoch gradcheck, lstm_eigen_class/lstm.cc:114-146)")
    p.add_argument("--crosscheck", type=int, default=None, metavar="K",
                   help="every K supersteps, compare the Pallas kernel's "
                        "loss/grad-norm against the XLA scan at the live "
                        "training point (the reference's Eigen-vs-CUDA "
                        "lockstep, lstm_eigen_CUDA/lstm.cu:425-496)")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler trace of a training window "
                        "into DIR (the rebuild's tracing subsystem, SURVEY.md §5)")


def _configs(args):
    from .config import DataConfig, ModelConfig, TrainConfig

    residual = getattr(args, "residual_dtype", "auto")
    if residual == "auto":
        # bf16 residuals pay where the BPTT residual streams are on the
        # critical path: the tiled H>=2048 regime, and long windows (S>=512:
        # +3.8% at S=1000, docs/PERFORMANCE.md long-context)
        residual = (
            "bfloat16"
            if args.dtype == "bfloat16"
            and (args.hidden >= 2048 or args.seq >= 512)
            else "float32"
        )
    mcfg = ModelConfig(
        vocab=args.vocab,
        hidden=args.hidden,
        num_layers=args.layers,
        cell_variant=args.cell,
        loss_mode=args.loss_mode,
        loss_base=args.loss_base,
        compute_dtype=args.dtype,
        residual_dtype=residual,
        forget_bias=args.forget_bias,
        embedding_mode=args.embedding,
        dropout=getattr(args, "dropout", 0.0),
        tie_embeddings=getattr(args, "tie_embeddings", False),
        scan_chunk=getattr(args, "scan_chunk", 0),
        seed=args.seed,
    )
    dcfg = DataConfig(
        path=args.data,
        train_percent=args.train_percent,
        batch=args.batch,
        seq=args.seq,
        stride=args.stride,
        carry_state=not args.no_carry,
        reset_std=args.reset_std,
    )
    # quality defaults (VERDICT r1): resolve auto lr/warmup so the documented
    # commands converge out of the box (measured sweep, docs/PERFORMANCE.md)
    # measured Adagrad stability ladder (docs/PERFORMANCE.md lr sweeps):
    # 0.1 at the reference's widths, 0.02 at H=512 single-layer, 0.005 for
    # stacks or H >= 1024 (0.02 stalls a 3x1024 at ~4.3 bpc; 0.005 reaches
    # 1.99 in 8k steps on bible.txt)
    if args.lr is not None:
        lr = args.lr
    elif args.hidden < 512:
        lr = 0.1
    elif args.hidden < 1024 and args.layers == 1:
        lr = 0.02
    else:
        lr = 0.005
    if args.warmup is not None:
        warmup = args.warmup
    elif getattr(args, "epochs", None):
        # epoch-driven runs are long: use the reference's full 50*S recipe
        # (the steps//10 cap exists only so *short* --steps runs still train)
        warmup = 50 * args.seq
    else:
        warmup = min(50 * args.seq, getattr(args, "steps", 10000) // 10)
    tcfg = TrainConfig(
        lr=lr,
        adagrad_eps=args.adagrad_eps,
        clip_norm=args.clip_norm,
        warmup_steps=warmup,
        lr_cycle_steps=getattr(args, "lr_cycle_steps", 0),
        lr_cycle_min_frac=getattr(args, "lr_cycle_min_frac", 0.1),
        steps=args.steps,
        superstep=args.superstep,
        log_every=args.log_every,
        eval_every_s=args.eval_every_s,
        eval_chars=args.eval_chars,
        sample_chars=args.sample_chars,
        checkpoint_dir=args.ckpt_dir,
        pp_chunks=getattr(args, "pp_chunks", 4),
        crosscheck_every=getattr(args, "crosscheck", None),
        gradcheck_every=getattr(args, "gradcheck_every", None),
        keep_snapshots=getattr(args, "keep_snapshots", False),
        seed=args.seed + 1,
    )
    return mcfg, dcfg, tcfg


def _make_trainer(args):
    from .data import corpus as corpus_mod
    from .ops.dispatch import select_cell_fn
    from .train.trainer import Trainer

    mcfg, dcfg, tcfg = _configs(args)
    uses_mesh = bool(
        getattr(args, "dp", None) or getattr(args, "tp", None)
        or getattr(args, "pp", None) or getattr(args, "sp", None)
    )
    streaming = getattr(args, "stream_data", None)
    if streaming is None:
        streaming = not uses_mesh     # the single-device fast path
    if streaming:
        import numpy as np

        from .data import streaming as streaming_mod

        data = streaming_mod.load_corpus_mmap(dcfg.path)
        train, test = corpus_mod.split(data, dcfg.train_percent)
        test = np.asarray(test)   # the held-out tail is small; materialize
    else:
        train, test = corpus_mod.load_dataset(dcfg)
    mesh = None
    parallel = "dp"
    n_dp = getattr(args, "dp", None)
    n_tp = getattr(args, "tp", None)
    n_pp = getattr(args, "pp", None)
    n_sp = getattr(args, "sp", None)
    if n_pp and (n_tp or n_sp):
        raise SystemExit("--pp combines only with --dp")
    if sum(map(bool, (n_dp, n_tp, n_sp, n_pp))) > 2:
        raise SystemExit("at most two parallel axes may be combined")
    if n_dp and n_tp:
        from .parallel.dp_tp import make_mesh_2d

        mesh = make_mesh_2d(n_dp, n_tp)
        parallel = "dp_tp"
        print(f"2-D mesh: {n_dp} data x {n_tp} model devices", flush=True)
    elif n_dp and n_pp:
        from .parallel.pp import make_mesh_dp_pp

        mesh = make_mesh_dp_pp(n_dp, n_pp)
        parallel = "dp_pp"
        print(f"2-D mesh: {n_dp} data x {n_pp} stage devices", flush=True)
    elif n_tp and n_sp:
        from .parallel.sp import make_mesh_tp_sp

        mesh = make_mesh_tp_sp(n_sp, n_tp)
        parallel = "tp_sp"
        print(f"2-D mesh: {n_sp} seq x {n_tp} model devices", flush=True)
    elif n_dp and n_sp:
        from .parallel.sp import make_mesh_dp_sp

        mesh = make_mesh_dp_sp(n_dp, n_sp)
        parallel = "dp_sp"
        print(f"2-D mesh: {n_dp} data x {n_sp} seq devices", flush=True)
    elif n_dp:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(n_dp)
        print(f"data-parallel over {n_dp} devices", flush=True)
    elif n_tp:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(n_tp, axis="model")
        parallel = "tp"
        print(f"tensor-parallel over {n_tp} devices", flush=True)
    elif n_pp:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(n_pp, axis="stage")
        parallel = "pp"
        print(f"pipeline-parallel over {n_pp} stages", flush=True)
    elif n_sp:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(n_sp, axis="seq")
        parallel = "sp"
        print(f"sequence-pipelined over {n_sp} time segments", flush=True)
    cell_fn = select_cell_fn(args.backend, mcfg, dcfg.batch)
    trainer = Trainer(
        mcfg, dcfg, tcfg, train, test,
        cell_fn=cell_fn,
        results_path=getattr(args, "results", None),
        mesh=mesh,
        parallel=parallel,
        streaming=streaming,
    )
    if getattr(args, "resume", None):
        trainer.restore(args.resume)
        print(f"resumed from {args.resume} at step {trainer.step}", flush=True)
    return trainer


def cmd_train(args):
    trainer = _make_trainer(args)
    if args.gradcheck:
        trainer.gradcheck(samples_per_tensor=50)
    steps = args.steps
    if getattr(args, "epochs", None):
        chars_per_step = trainer.dcfg.batch * trainer.dcfg.effective_stride
        steps = max(1, int(args.epochs * len(trainer.train_np) / chars_per_step))
        print(f"--epochs {args.epochs} -> {steps} steps", flush=True)
    if args.profile:
        import jax

        # warm up (compile) outside the trace, then capture a short window
        trainer.run(steps=trainer.tcfg.superstep, quiet=True)
        with jax.profiler.trace(args.profile):
            trainer.run(steps=5 * trainer.tcfg.superstep, quiet=True)
        print(f"profile trace written to {args.profile}", flush=True)
    trainer.run(steps)
    if trainer.test_np is not None and len(trainer.test_np) > 1:
        bpc = trainer.evaluate()
        print(f"final test bpc: {bpc:.4f}", flush=True)
    if args.ckpt_dir:
        trainer.save(f"{args.ckpt_dir}/ckpt.npz")
        print(f"saved {args.ckpt_dir}/ckpt.npz", flush=True)
    if args.sample_chars:
        print("--- sample ---", flush=True)
        print(trainer.sample(args.sample_chars), flush=True)


def cmd_sample(args):
    trainer = _make_trainer(args)
    trainer.restore(args.ckpt)
    print(trainer.sample(args.length, temperature=args.temperature), flush=True)


def cmd_eval(args):
    trainer = _make_trainer(args)
    trainer.restore(args.ckpt)
    bpc = trainer.evaluate(max_chars=args.eval_chars)
    print(json.dumps({"test_bpc": bpc}), flush=True)


def cmd_bench(args):
    from .bench import run_benchmark

    result = run_benchmark(args)
    print(json.dumps(result), flush=True)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="eigen_lstm_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train", help="train a char-LSTM LM")
    _add_model_args(p_train)
    _add_data_args(p_train)
    _add_train_args(p_train)
    p_train.set_defaults(fn=cmd_train)

    p_sample = sub.add_parser("sample", help="generate text from a checkpoint")
    _add_model_args(p_sample)
    _add_data_args(p_sample)
    _add_train_args(p_sample)
    p_sample.add_argument("--ckpt", required=True)
    p_sample.add_argument("--length", type=int, default=1000)
    p_sample.add_argument("--temperature", type=float, default=1.0)
    p_sample.set_defaults(fn=cmd_sample)

    p_eval = sub.add_parser("eval", help="bits/char on the held-out split")
    _add_model_args(p_eval)
    _add_data_args(p_eval)
    _add_train_args(p_eval)
    p_eval.add_argument("--ckpt", required=True)
    p_eval.set_defaults(fn=cmd_eval)

    p_bench = sub.add_parser("bench", help="throughput benchmark")
    _add_model_args(p_bench)
    _add_data_args(p_bench)
    _add_train_args(p_bench)
    p_bench.add_argument("--bench-steps", type=int, default=200)
    p_bench.add_argument("--warmup-steps", type=int, default=20)
    p_bench.set_defaults(fn=cmd_bench)

    return ap


def main(argv=None):
    from .utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
