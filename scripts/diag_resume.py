#!/usr/bin/env python
"""Diagnose the post-resume held-out regression (round 5).

Facts being tested:
  * ``ckpt_step162500.npz`` carries meta ``test_bpc: 1.45047575`` computed
    in-process by the (killed) scratch instance right before saving.
  * The resumed instance's first eval (step 195000) regressed to 1.614 and
    its Adagrad accumulators for layers 0-1 grew ~100x faster than in any
    comparable pre-restart interval.

Step 1 re-evaluates the restored state: bit-equal 1.45047575 proves
restore(params) and the evaluator are faithful, isolating the fault to the
post-resume *training* dynamics. Step 2 dispatches supersteps and prints
per-superstep train bits and gradient global-norm — an immediate explosion
implicates the restored optimizer/stream/cursor state; a delayed one
implicates organic divergence that the scratch run simply never reached.
"""

import json
import sys

sys.path.insert(0, ".")

from eigen_lstm_tpu import cli as cli_mod

ARGS = [
    "train",
    "--data", "/tmp/bigcorpus_full.bin",
    "--train-percent", "0.948955",
    "--hidden", "1024", "--layers", "3", "--batch", "128", "--seq", "256",
    "--dtype", "bfloat16", "--backend", "pallas", "--stream-data",
    "--dropout", "0.2",
    "--steps", "2000000", "--superstep", "50", "--log-every", "2500",
    "--lr", "0.005", "--warmup", "1000",
    "--eval-every-s", "900", "--eval-chars", "250000",
    "--resume", "artifacts/flagship_full/ckpt_step162500.npz",
]


def main():
    parser = cli_mod.build_parser()
    args = parser.parse_args(ARGS)
    trainer = cli_mod._make_trainer(args)
    print(f"restored at step {trainer.step}", flush=True)

    bpc = trainer.evaluate(max_chars=250000)
    print(json.dumps({"restored_eval_bpc": bpc, "expected": 1.45047575}),
          flush=True)

    for k in range(10):
        trainer.state, metrics = trainer.dispatch_superstep()
        bits = float(metrics["bits_mean"])
        gn = float(metrics["gnorm_mean"])
        print(f"superstep {k}: step {trainer.step} bits {bits:.4f} "
              f"gnorm_mean {gn:.4f}", flush=True)

    bpc2 = trainer.evaluate(max_chars=250000)
    print(json.dumps({"post_500step_eval_bpc": bpc2}), flush=True)


if __name__ == "__main__":
    main()
