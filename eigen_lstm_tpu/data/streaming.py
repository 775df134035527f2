"""Host-streaming window feeder — data feeding without a device-resident corpus.

The resident path (``data/corpus.py``) uploads the whole corpus to device
memory and gathers windows *inside* the jitted superstep — optimal for the
reference's corpora (alice29 … enwik8, ≤100 MB). At enwik9 scale (1 GB) the
corpus starts competing with model/optimizer state for HBM, so this module
keeps it on the host (``np.memmap`` — zero-copy pages via the OS cache,
the same mmap strategy as the native loader, ``native/eigenlstm_io.cpp``)
and ships each superstep one small ``(K, S+1, B)`` uint8 window batch
(~130 kB at the headline config vs the multi-GB corpus). The trainer
double-buffers the transfer: the next superstep's batch is device_put while
the current superstep computes, so the feed rides under the compute.

Cursor semantics replicate ``corpus.advance_positions`` exactly — same
stride, same wrap modulo — so a streamed run is trajectory-identical to a
resident run from the same seed (gated by tests/test_streaming.py). The
in-jit copy of the cursors stays in ``TrainState.positions`` (advanced by
the same pure function), which keeps checkpoints interchangeable between
the two modes; ``WindowFeeder.set_positions`` re-syncs the host copy after
a restore.

Reference counterpart: the host-side window build the CUDA driver performs
every character step (``class_CUDA/lstm.cc:277-311``) — here it happens
once per superstep, for K·B windows at a time, off the critical path.

Scale bound: stream cursors are int32 end-to-end (host mirror, device
``TrainState.positions``, checkpoint format), so corpora are limited to
2^31-1 bytes (~2.1 GB) — 21x enwik9-class headroom over the largest corpus
the reference names. ``load_corpus_mmap`` rejects larger files explicitly
rather than overflowing; widening to int64 cursors (jax_enable_x64 or a
split hi/lo scheme) is the documented extension path if multi-GB corpora
ever appear.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..config import DataConfig


def load_corpus_mmap(path: str) -> np.ndarray:
    """Corpus as a read-only byte memmap (no RSS cost until pages are
    touched). Drop-in for ``corpus.rawread`` for the streaming path."""
    data = np.memmap(path, dtype=np.uint8, mode="r")
    if data.shape[0] >= np.iinfo(np.int32).max:
        raise ValueError(
            f"corpus {path} is {data.shape[0]} bytes; stream cursors are "
            f"int32, max supported corpus is {np.iinfo(np.int32).max - 1} "
            "bytes (see data/streaming.py docstring)"
        )
    return data


def advance_host(
    positions: np.ndarray, stride: int, corpus_len: int, seq: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host mirror of ``corpus.advance_positions`` (identical wrap modulo)."""
    limit = corpus_len - seq - 1
    nxt = positions.astype(np.int64) + stride
    wrapped = nxt > limit
    nxt = np.where(wrapped, nxt % max(limit, 1), nxt)
    return nxt.astype(np.int32), wrapped


class WindowFeeder:
    """Builds per-superstep window batches from a host-resident corpus.

    ``next_batch()`` returns a ``(K, S+1, B)`` uint8 array: K inner steps'
    combined x/target windows (``win[:-1]`` is x, ``win[1:]`` the next-byte
    targets — the ev_x/ev_t pairing of ``class_batch/lstm.cc:279-284``),
    advancing the host cursors by ``stride`` per inner step with resident
    wrap semantics.

    Invariant: the trainer prefetches one batch right after each dispatch,
    so between supersteps ``self.positions`` leads the device's
    ``TrainState.positions`` by one superstep (K·stride per stream).
    ``TrainState.positions`` is the source of truth; call
    ``set_positions(state.positions)`` before reading ``self.positions``
    directly (``Trainer.restore`` does exactly this).
    """

    def __init__(
        self,
        data: np.ndarray,
        dcfg: DataConfig,
        superstep: int,
        positions: Optional[np.ndarray] = None,
    ):
        if len(data) < dcfg.seq + 2:
            raise ValueError(f"corpus too short: len={len(data)} seq={dcfg.seq}")
        self.data = data
        self.seq = dcfg.seq
        self.stride = dcfg.effective_stride
        self.batch = dcfg.batch
        self.superstep = superstep
        self._offs = np.arange(self.seq + 1, dtype=np.int64)[:, None]
        self.positions = (
            np.zeros(self.batch, np.int32)
            if positions is None
            else np.asarray(positions, np.int32).copy()
        )

    def set_positions(self, positions: np.ndarray) -> None:
        """Re-sync host cursors (after init or checkpoint restore)."""
        self.positions = np.asarray(positions, np.int32).copy()

    def build(self, positions: np.ndarray) -> np.ndarray:
        """One (S+1, B) uint8 window stack at the given cursors."""
        idx = positions.astype(np.int64)[None, :] + self._offs
        return np.ascontiguousarray(self.data[idx])

    def next_batch(self) -> np.ndarray:
        """(K, S+1, B) uint8 windows for the next superstep; advances the
        host cursors past them."""
        k = self.superstep
        out = np.empty((k, self.seq + 1, self.batch), np.uint8)
        pos = self.positions
        for i in range(k):
            out[i] = self.build(pos)
            pos, _ = advance_host(pos, self.stride, len(self.data), self.seq)
        self.positions = pos
        return out
