#!/usr/bin/env python
"""Build the >=100 MB streamed-training corpus from the mirrored corpora.

The reference's flagship results are trained on enwik8 (100 MB,
``class_CUDA/lstm.cc:73`` — the file itself is not shipped in its tree).
This box has no egress, so the >=100 MB corpus is built from the corpora the
reference *does* ship (SURVEY.md appendix: Calgary + Canterbury + enwik6 +
world192 + book1), mirrored under ``data/``.

Construction — leak-free by design:

1. Take every *text* corpus file (binary payloads — geo/obj/pic/xls/ptt5/sum
   — are excluded: byte soup teaches a char LM nothing about the held-out
   text), deduplicated by content hash (alice29/world192/book1 appear twice
   in the mirrors).
2. Split each file: the last ``holdout_frac`` goes to a held-out tail pool
   T, the head goes to the unique train block U. T therefore matches U's
   mixture distribution file-by-file but shares no byte range with it.
3. Emit ``U * k + T`` with k chosen to clear ``--target-mb``. The train/test
   boundary for the CLI is exactly ``k*len(U) / total``: the *train* split
   is k repetitions of U (a k-epoch curriculum, which is what any multi-epoch
   run does anyway) and the *test* split is T — text the model has NEVER
   seen any copy of. This is the same held-out semantics as the reference's
   99/1 enwik8 split (``class_CUDA/lstm.cc:77-86``), unlike naively
   repeating the whole concatenation (which would put copies of the test
   tail in train).

Prints the exact ``--train-percent`` to pass (rounded *down* so the split
index can only land before the U/T boundary — a few bytes of U lost to test
is harmless; T bytes leaking into train would not be) and writes a JSON
sidecar with the manifest.

Usage:
  python scripts/build_bigcorpus.py --out /tmp/bigcorpus.bin [--target-mb 105]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# text-only members (binary payloads excluded), relative to data/
CANDIDATES = [
    "alice29.txt", "book1.txt", "enwik6.txt", "world192.txt",
    "calgary/bib", "calgary/book1", "calgary/book2", "calgary/news",
    "calgary/paper1", "calgary/paper2", "calgary/paper3", "calgary/paper4",
    "calgary/paper5", "calgary/paper6", "calgary/progc", "calgary/progl",
    "calgary/progp", "calgary/trans",
    "cantrbry/alice29.txt", "cantrbry/asyoulik.txt", "cantrbry/bible.txt",
    "cantrbry/cp.html", "cantrbry/fields.c", "cantrbry/grammar.lsp",
    "cantrbry/lcet10.txt", "cantrbry/plrabn12.txt", "cantrbry/world192.txt",
    "cantrbry/xargs.1",
]


def build(out: str, target_mb: float = 105.0, holdout_frac: float = 0.08,
          data_dir: str | None = None) -> dict:
    data_dir = data_dir or os.path.join(REPO, "data")
    seen: set[str] = set()
    files = []
    for rel in CANDIDATES:
        path = os.path.join(data_dir, rel)
        with open(path, "rb") as f:
            blob = f.read()
        h = hashlib.sha256(blob).hexdigest()
        if h in seen:
            continue
        seen.add(h)
        files.append((rel, blob))

    heads, tails = [], []
    for rel, blob in files:
        cut = len(blob) - int(len(blob) * holdout_frac)
        heads.append(blob[:cut])
        tails.append(blob[cut:])
    unique = b"".join(heads)
    tail = b"".join(tails)

    k = max(1, math.ceil(target_mb * 1e6 / len(unique)))
    total = k * len(unique) + len(tail)
    # round DOWN so int(total * pct) <= k*len(unique): the boundary error
    # trims a little U into test instead of ever leaking T into train
    train_percent = math.floor(k * len(unique) / total * 1e6) / 1e6

    with open(out, "wb") as f:
        for _ in range(k):
            f.write(unique)
        f.write(tail)

    manifest = {
        "out": out,
        "total_bytes": total,
        "unique_bytes": len(unique),
        "holdout_bytes": len(tail),
        "repeats": k,
        "holdout_frac": holdout_frac,
        "train_percent": train_percent,
        "files": [
            {"path": rel, "bytes": len(blob)} for rel, blob in files
        ],
    }
    with open(out + ".json", "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bigcorpus.bin")
    ap.add_argument("--target-mb", type=float, default=105.0)
    ap.add_argument("--holdout-frac", type=float, default=0.08)
    args = ap.parse_args()
    m = build(args.out, args.target_mb, args.holdout_frac)
    print(json.dumps({k: v for k, v in m.items() if k != "files"}, indent=1))
    print(f"--data {m['out']} --train-percent {m['train_percent']}")


if __name__ == "__main__":
    main()
