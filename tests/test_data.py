"""Data pipeline tests: rawread, split, device-side windowing, cursor wrap.

Reference behaviors mirrored: window build + next-byte targets
(class_batch/lstm.cc:279-296), cursor advance with EOF wrap (:297-300),
leading-percent split (:54-59).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigen_lstm_tpu.config import DataConfig
from eigen_lstm_tpu.data import corpus as corpus_mod


def test_rawread_roundtrip(tmp_path):
    p = tmp_path / "c.bin"
    payload = bytes(range(256)) * 3
    p.write_bytes(payload)
    data = corpus_mod.rawread(str(p))
    assert data.dtype == np.uint8
    np.testing.assert_array_equal(data, np.frombuffer(payload, np.uint8))


def test_split_percent():
    data = np.arange(1000, dtype=np.uint8)
    train, test = corpus_mod.split(data, 0.95)
    assert len(train) == 950 and len(test) == 50
    np.testing.assert_array_equal(np.concatenate([train, test]), data)


def test_windows_are_shifted_targets():
    data = np.arange(100, dtype=np.uint8)
    corpus = jnp.asarray(data)
    positions = jnp.asarray([0, 10, 37], jnp.int32)
    x, t = corpus_mod.make_windows(corpus, positions, seq=5)
    assert x.shape == (5, 3) and t.shape == (5, 3)
    # x[t, b] = corpus[pos_b + t]; target is the next byte
    np.testing.assert_array_equal(np.asarray(x[:, 1]), np.arange(10, 15))
    np.testing.assert_array_equal(np.asarray(t[:, 1]), np.arange(11, 16))
    np.testing.assert_array_equal(np.asarray(t), np.asarray(x) + 1)


def test_advance_and_wrap():
    length, seq = 50, 10
    limit = length - seq - 1  # 39
    positions = jnp.asarray([0, 35, 39], jnp.int32)
    new, wrapped = corpus_mod.advance_positions(positions, stride=10, corpus_len=length, seq=seq)
    np.testing.assert_array_equal(np.asarray(wrapped), [False, True, True])
    assert new[0] == 10
    # wrapped cursors stay in valid range
    assert np.all(np.asarray(new) <= limit) and np.all(np.asarray(new) >= 0)


def test_init_positions_in_range():
    key = jax.random.PRNGKey(0)
    pos = corpus_mod.init_positions(key, batch=64, corpus_len=1000, seq=25)
    p = np.asarray(pos)
    assert p.shape == (64,)
    assert p.min() >= 0 and p.max() <= 1000 - 25 - 1
    # reproducible
    pos2 = corpus_mod.init_positions(key, batch=64, corpus_len=1000, seq=25)
    np.testing.assert_array_equal(p, np.asarray(pos2))


def test_windowing_is_jittable():
    """The whole batching path must live under jit (zero host traffic)."""
    data = np.arange(200, dtype=np.uint8)
    corpus = jnp.asarray(data)

    @jax.jit
    def step(positions):
        x, t = corpus_mod.make_windows(corpus, positions, seq=8)
        newpos, wrapped = corpus_mod.advance_positions(positions, 8, 200, 8)
        return x, t, newpos, wrapped

    x, t, newpos, wrapped = step(jnp.asarray([0, 100], jnp.int32))
    assert x.shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(newpos), [8, 108])


def test_corpus_streams_end_to_end(tmp_path):
    p = tmp_path / "c.bin"
    p.write_bytes(bytes(np.arange(256, dtype=np.uint8)) * 8)
    cfg = DataConfig(path=str(p), train_percent=0.9, batch=4, seq=16)
    train, test = corpus_mod.load_dataset(cfg)
    assert len(train) == int(2048 * 0.9)
    streams = corpus_mod.CorpusStreams(train, cfg)
    pos = streams.init_positions(jax.random.PRNGKey(1))
    x, t = streams.windows(pos)
    assert x.shape == (16, 4)
    newpos, wrapped = streams.advance(pos)
    assert newpos.shape == (4,)
