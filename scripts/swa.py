#!/usr/bin/env python
"""Tail weight averaging (SWA) over per-eval checkpoint snapshots.

Averages the *parameter* tensors of K snapshots written by
``--keep-snapshots`` (trainer ``report_eval``) into a single checkpoint.
Optimizer state, data cursors, stream state, RNG, and step metadata are
carried from the newest input so the output is loadable by every
``cli.py`` subcommand (eval / sample / resume).

Averaging iterates of a plateaued run is a pure post-processing lever:
it costs no training compute and classically recovers a lower point of
the loss basin than any single iterate (Polyak averaging / SWA). The
reference has no counterpart — its rolling save keeps exactly one
snapshot (``class_CUDA/lstm.cc:224-228``).

Usage:
  python scripts/swa.py --out avg.npz ckpt_step*.npz [--last K]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np


def step_of(path: str) -> int:
    m = re.search(r"step(\d+)", os.path.basename(path))
    if m is None:
        raise ValueError(
            f"{path} is not a per-eval snapshot (expected 'step<N>' in the "
            "name); pass ckpt_step*.npz files, not ckpt.npz/ckpt_best.npz"
        )
    return int(m.group(1))


def average(paths, out_path: str) -> dict:
    paths = sorted(paths, key=step_of)
    with np.load(paths[-1]) as z:
        base = {k: z[k] for k in z.files}
    acc = {
        k: np.zeros(v.shape, dtype=np.float64)
        for k, v in base.items()
        if k.startswith("params")
    }
    for p in paths:
        with np.load(p) as z:
            for k in acc:
                acc[k] += np.asarray(z[k], dtype=np.float64)
    for k in acc:
        base[k] = (acc[k] / len(paths)).astype(base[k].dtype)
    meta = json.loads(bytes(base["meta/json"]).decode())
    # the carried test_bpc belongs to the newest *input*, not the average —
    # it would poison trainer._best_test_bpc() seeding if promoted to
    # ckpt_best.npz
    meta.pop("test_bpc", None)
    meta["swa_steps"] = [step_of(p) for p in paths]
    base["meta/json"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **base)
    os.replace(tmp, out_path)
    return meta


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("ckpts", nargs="+", help="snapshot .npz files to average")
    ap.add_argument("--out", required=True, help="output checkpoint path")
    ap.add_argument("--last", type=int, default=None,
                    help="only average the newest K snapshots")
    args = ap.parse_args(argv)
    paths = sorted(args.ckpts, key=step_of)
    if args.last is not None:
        if args.last < 2:
            sys.exit("--last must be >= 2")
        paths = paths[-args.last:]
    if len(paths) < 2:
        sys.exit("need at least 2 snapshots to average")
    meta = average(paths, args.out)
    print(json.dumps({"out": args.out, "averaged": meta["swa_steps"]}))


if __name__ == "__main__":
    main()
