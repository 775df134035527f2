"""Flagship-corpus builder invariants (scripts/build_bigcorpus.py).

The held-out construction must be leak-free: no byte of the tail pool may
appear anywhere in the train block, and the printed --train-percent must
land the CLI's split index at or before the train/tail boundary (a few
train bytes lost to test is harmless; the reverse would leak). Round-5
adds reference-tree ingestion (20_newsgroups + reuters21578) with whole-
document stride holdout and a seeded shuffle of the tail pool.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir, "scripts")
)
import build_bigcorpus as bbc  # noqa: E402


def _fake_docs():
    """Deterministic stand-in for the reference tree's documents: two
    'groups' of small posts plus one large file that takes the per-file
    byte split."""
    rng = np.random.default_rng(7)
    docs = []
    for g in ("alt.a", "rec.b"):
        for i in range(25):
            body = bytes(rng.integers(97, 123, 400 + 13 * i, dtype=np.uint8))
            docs.append((f"20_newsgroups/{g}/{10000+i}", body))
    big = bytes(rng.integers(32, 127, 400_000, dtype=np.uint8))
    docs.append(("reuters21578/reut2-000.sgm", big))
    return docs


@pytest.fixture()
def ref_stubbed(monkeypatch):
    docs = _fake_docs()
    monkeypatch.setattr(bbc, "_iter_ref_documents", lambda: iter(docs))
    return docs


def test_legacy_mode_reproduces_committed_train_percent(tmp_path):
    """The r3/r4 scripts hardcode --train-percent 0.992156 for the legacy
    corpus; the builder must keep producing exactly that boundary."""
    m = bbc.build(str(tmp_path / "c.bin"), target_mb=105.0, holdout_frac=0.08)
    assert m["train_percent"] == 0.992156
    assert m["repeats"] == 11
    assert m["unique_bytes"] == 10228512


def test_ref_data_leak_free_and_boundary(tmp_path, ref_stubbed):
    out = str(tmp_path / "full.bin")
    m = bbc.build(out, target_mb=1.0, holdout_frac=0.1, ref_data=True)
    data = open(out, "rb").read()
    split = int(len(data) * m["train_percent"])
    # the CLI split can only trim train bytes into test, never the reverse
    assert split <= m["repeats"] * m["unique_bytes"]
    train = data[: m["repeats"] * m["unique_bytes"]]
    tail = data[m["repeats"] * m["unique_bytes"]:]
    assert len(tail) == m["holdout_bytes"]
    # every held-out document is absent from train (stride holdout is
    # per-BUCKET: holdout_frac 0.1 -> every 10th post within each group)
    counts = {}
    held = []
    for rel, b in ref_stubbed[:50]:
        bucket = rel.rsplit("/", 1)[0]
        i = counts.get(bucket, 0)
        counts[bucket] = i + 1
        if i % 10 == 9:
            held.append(b)
    assert held, "stride holdout selected nothing"
    for blob in held:
        assert blob in tail
        assert blob not in train
    # large files take the byte split: the last 10% of the .sgm is held out
    big = ref_stubbed[-1][1]
    cut = len(big) - int(len(big) * 0.1)
    assert big[:cut] in train
    assert big[cut:] not in train


def test_ref_data_tail_shuffle_is_seeded(tmp_path, ref_stubbed):
    a = str(tmp_path / "a.bin")
    b = str(tmp_path / "b.bin")
    bbc.build(a, target_mb=1.0, holdout_frac=0.1, ref_data=True)
    bbc.build(b, target_mb=1.0, holdout_frac=0.1, ref_data=True)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_ref_data_dedup(tmp_path, ref_stubbed, monkeypatch):
    docs = list(ref_stubbed) + [ref_stubbed[0], ref_stubbed[3]]  # cross-posts
    monkeypatch.setattr(bbc, "_iter_ref_documents", lambda: iter(docs))
    m = bbc.build(str(tmp_path / "d.bin"), target_mb=1.0, holdout_frac=0.1,
                  ref_data=True)
    assert m["ref_data"]["dups"] == 2
    assert m["ref_data"]["docs"] == len(ref_stubbed)
