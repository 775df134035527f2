"""Byte-corpus loading and device-resident stream batching.

Reference counterparts:
* ``rawread(filename)`` — whole file → byte matrix (root ``lstm.cc:382-420``).
* Train/test split by leading percentage — 95/5 (``class_batch/lstm.cc:54-59``)
  or 99/1 (``class_CUDA/lstm.cc:77-86``).
* B independent stream cursors at random offsets, each step rebuilding an
  S-byte window of (x, target) pairs and advancing by 1 (sliding, overlapping
  windows — ``class_batch/lstm.cc:150-156,279-302``) or by ``S/2`` with
  hidden-state carry (segment/TBPTT mode — ``lstm_segment.cc:110,183-187``);
  on EOF the cursor wraps and the stream's h/c are re-randomized
  (``class_batch/lstm.cc:270-300``).

TPU-first redesign: the corpus lives on-device as a uint8 array, windows are
built *inside jit* with a gather (``corpus[positions[:,None] + arange(S+1)]``)
and cursors are part of the jitted training carry — zero host↔device traffic
per step, vs the reference's per-character host windowing + full H2D copy
(``class_CUDA/lstm.cc:277-317``). When a fast host-side path is needed (e.g.
feeding per-device shards), the native C++ loader in ``native/`` serves the
same window layout from an mmap'd corpus.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DataConfig


def rawread(path: str) -> np.ndarray:
    """Whole file → uint8 array (root ``lstm.cc:382-420``). Uses the native
    C++ reader when built (utils/native.py), Python IO otherwise."""
    from ..utils import native

    data = native.read_file(path)
    if len(data) == 0:
        raise ValueError(f"empty corpus: {path}")
    return data


def split(data: np.ndarray, train_percent: float) -> Tuple[np.ndarray, np.ndarray]:
    """Leading-percentage split (``class_batch/lstm.cc:54-59``)."""
    n_train = int(len(data) * train_percent)
    return data[:n_train], data[n_train:]


def init_positions(
    key: jax.Array, batch: int, corpus_len: int, seq: int
) -> jax.Array:
    """Random starting offsets per stream (``class_batch/lstm.cc:150-156``).
    Positions index the window *start*; valid range [0, corpus_len - seq - 1]."""
    limit = corpus_len - seq - 1
    if limit <= 0:
        raise ValueError(f"corpus too short: len={corpus_len} seq={seq}")
    return jax.random.randint(key, (batch,), 0, limit, dtype=jnp.int32)


def make_windows(
    corpus: jax.Array, positions: jax.Array, seq: int
) -> Tuple[jax.Array, jax.Array]:
    """Gather (x, target) windows for every stream, inside jit.

    corpus: (L,) uint8 device array. positions: (B,) int32 window starts.
    Returns x, targets each (S, B) int32 — next-byte prediction, the
    reference's ``ev_x``/``ev_t`` pairs (``class_batch/lstm.cc:279-284``).
    """
    offs = jnp.arange(seq + 1, dtype=jnp.int32)
    idx = positions[None, :] + offs[:, None]          # (S+1, B)
    window = corpus[idx].astype(jnp.int32)            # (S+1, B)
    return window[:-1], window[1:]


def advance_positions(
    positions: jax.Array, stride: int, corpus_len: int, seq: int
) -> Tuple[jax.Array, jax.Array]:
    """Advance cursors by ``stride``; wrap to 0 at EOF.

    Returns (new_positions, wrapped_mask (B,) bool). The reference wraps the
    cursor and re-randomizes that stream's h/c (``class_batch/lstm.cc:270-300``);
    the caller uses ``wrapped_mask`` to reset stream state likewise.
    """
    limit = corpus_len - seq - 1
    nxt = positions + stride
    wrapped = nxt > limit
    nxt = jnp.where(wrapped, nxt % jnp.maximum(limit, 1), nxt)
    return nxt.astype(jnp.int32), wrapped


class CorpusStreams:
    """Host-side convenience bundling a device corpus + config.

    Holds the corpus as a device array; all per-step work (windows, cursor
    advance) is pure-functional and jit-composable via the module functions.
    """

    def __init__(self, data: np.ndarray, cfg: DataConfig):
        self.cfg = cfg
        self.corpus = jnp.asarray(data)  # uint8 on default device
        self.length = int(len(data))

    def init_positions(self, key: jax.Array) -> jax.Array:
        return init_positions(key, self.cfg.batch, self.length, self.cfg.seq)

    def windows(self, positions: jax.Array):
        return make_windows(self.corpus, positions, self.cfg.seq)

    def advance(self, positions: jax.Array):
        return advance_positions(
            positions, self.cfg.effective_stride, self.length, self.cfg.seq
        )


def load_dataset(cfg: DataConfig) -> Tuple[np.ndarray, np.ndarray]:
    """rawread + split in one call."""
    data = rawread(cfg.path)
    return split(data, cfg.train_percent)
