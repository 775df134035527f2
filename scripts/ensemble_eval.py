#!/usr/bin/env python
"""Score a probability-space ensemble of checkpoints on a held-out split.

Members may have different architectures. Each member is a JSON spec:

  python scripts/ensemble_eval.py --data /tmp/bigcorpus.bin \
      --train-percent 0.992156 --eval-chars 250000 --backend pallas \
      --member '{"ckpt": "artifacts/flagship_drop/ckpt_best.npz",
                 "hidden": 1024, "layers": 3}' \
      --member '{"ckpt": "artifacts/flagship_small/ckpt_best.npz",
                 "hidden": 768, "layers": 2, "tie_embeddings": true}'

Prints one JSON line: {"ensemble_bpc": ..., "member_bpc": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_member(spec: dict, dtype: str, backend: str, eval_batch: int):
    from eigen_lstm_tpu.config import ModelConfig
    from eigen_lstm_tpu.models import lstm as model
    from eigen_lstm_tpu.ops.dispatch import select_cell_fn
    from eigen_lstm_tpu.train import checkpoint as ckpt_mod

    cfg = ModelConfig(
        vocab=spec.get("vocab", 256),
        hidden=spec["hidden"],
        num_layers=spec.get("layers", 1),
        cell_variant=spec.get("cell", "reference"),
        compute_dtype=spec.get("dtype", dtype),
        tie_embeddings=spec.get("tie_embeddings", False),
        seed=0,
    )
    like = model.init_params(cfg)
    params = ckpt_mod.load_params(spec["ckpt"], like)
    cell_fn = select_cell_fn(
        spec.get("backend", backend), cfg, eval_batch
    )
    return params, cfg, cell_fn


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--member", action="append", required=True,
                    help="JSON member spec (repeatable): "
                         '{"ckpt": PATH, "hidden": N, "layers": L, ...}')
    ap.add_argument("--data", required=True)
    ap.add_argument("--train-percent", type=float, default=0.9)
    ap.add_argument("--eval-chars", type=int, default=None)
    ap.add_argument("--eval-batch", type=int, default=16)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args(argv)

    from eigen_lstm_tpu.data import corpus as corpus_mod
    from eigen_lstm_tpu.train import evaluator as eval_mod

    data = corpus_mod.rawread(args.data)
    _, test = corpus_mod.split(data, args.train_percent)
    members = [
        load_member(json.loads(s), args.dtype, args.backend, args.eval_batch)
        for s in args.member
    ]
    member_bpc = [
        eval_mod.evaluate_bpc(
            p, test, cfg, eval_batch=args.eval_batch,
            max_chars=args.eval_chars, cell_fn=cf,
        )
        for p, cfg, cf in members
    ]
    ens = eval_mod.evaluate_ensemble_bpc(
        members, test, eval_batch=args.eval_batch, max_chars=args.eval_chars
    )
    print(json.dumps({"ensemble_bpc": ens, "member_bpc": member_bpc}))


if __name__ == "__main__":
    main()
