"""Held-out evaluation: bits/char over a test split.

Reference: ``test(p, testdata)`` runs a *single-stream* forward over the whole
held-out set accumulating ``-log2 p(next)`` (``class_CUDA/lstm.cc:661-720``).

TPU-native redesign: the test bytes are folded into E parallel streams
(each a contiguous span of the corpus) and scored by one jitted scan over
fixed-size chunks with hidden-state carry — identical semantics per stream,
~E× faster, and exactly the reference semantics at ``eval_batch=1``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models import lstm as model


@functools.partial(
    jax.jit, static_argnames=("cfg", "chunk", "n_chunks", "cell_fn")
)
def _score_streams(
    params: model.LSTMParams,
    x: jax.Array,        # (T, E) int32 inputs, T = n_chunks * chunk
    t: jax.Array,        # (T, E) int32 next-byte targets
    mask: jax.Array,     # (T, E) bool — True where the position is real
    cfg: ModelConfig,
    chunk: int,
    n_chunks: int,
    cell_fn=None,
) -> jax.Array:
    """Sum of -log2 p(target) over the masked (T, E) positions."""
    e = x.shape[1]
    h, c = model.init_state(cfg, e)
    xc = x.reshape(n_chunks, chunk, e)
    tc = t.reshape(n_chunks, chunk, e)
    mc = mask.reshape(n_chunks, chunk, e)

    def body(carry, xt):
        h, c, acc = carry
        xi, ti, mi = xt
        h_seq, (h, c) = model.forward(params, xi, h, c, cfg, cell_fn=cell_fn)
        logits = model.logits_from_h(params, h_seq, cfg)
        bits = model.softmax_xent_bits(logits, ti)
        return (h, c, acc + jnp.sum(bits * mi)), None

    (_, _, total), _ = jax.lax.scan(body, (h, c, jnp.float32(0.0)), (xc, tc, mc))
    return total


def _build_streams(test_data, eval_batch: int, chunk: int, max_chars):
    """Fold the held-out bytes into E contiguous streams of ceil-sized
    spans with the padded tail masked out — every byte scored exactly once
    (the reference's ``test()`` scores the full split,
    ``class_CUDA/lstm.cc:661-720``)."""
    data = test_data
    if max_chars is not None and len(data) > max_chars + 1:
        data = data[: max_chars + 1]
    usable = len(data) - 1
    if usable < 1:
        raise ValueError("test split too small to evaluate")
    if usable < eval_batch * chunk:
        eval_batch = 1
    span = -(-usable // eval_batch)                # chars per stream (ceil)
    chunk = min(chunk, span)
    n_chunks = -(-span // chunk)
    span_pad = n_chunks * chunk
    need = (eval_batch - 1) * span + span_pad + 1
    if need > len(data):
        data = np.concatenate(
            [data, np.zeros(need - len(data), dtype=data.dtype)]
        )
    # stream e covers bytes [e*span, e*span + span): contiguous spans, like
    # splitting the reference's single stream into E independent ones
    starts = np.arange(eval_batch) * span
    x = np.stack([data[s : s + span_pad] for s in starts], axis=1)    # (T, E)
    t = np.stack([data[s + 1 : s + span_pad + 1] for s in starts], axis=1)
    # a position is real iff it lies inside this stream's own span AND the
    # split (the chunk-padding overruns into the next stream's bytes, which
    # that stream scores itself)
    local = np.arange(span_pad)[:, None]
    idx = starts[None, :] + local
    mask = (idx < usable) & (local < span)
    return x, t, mask, usable, eval_batch, chunk, n_chunks


def _regate_cell_fn(cell_fn, cfg: ModelConfig, eval_batch: int):
    """The Pallas kernels were gated for the *training* batch; re-gate for
    the eval batch (tiny splits drop to a single stream, which violates the
    batch%8 sublane requirement) — fall back to XLA."""
    if cell_fn is not None and (eval_batch % 8 != 0 or cfg.hidden % 128 != 0):
        return None
    return cell_fn


def evaluate_bpc(
    params: model.LSTMParams,
    test_data: np.ndarray,
    cfg: ModelConfig,
    eval_batch: int = 16,
    chunk: int = 128,
    max_chars: Optional[int] = None,
    cell_fn=None,
) -> float:
    """bits/char on the held-out split (reference ``test()``, parity at
    ``eval_batch=1``). ``max_chars`` caps scored bytes for timed evals.
    ``cell_fn``: optional Pallas recurrence backend (the trainer passes its
    own, so timed evals don't fall back to the slow-compiling XLA scan)."""
    x, t, mask, usable, eval_batch, chunk, n_chunks = _build_streams(
        test_data, eval_batch, chunk, max_chars
    )
    total = _score_streams(
        params,
        jnp.asarray(x.astype(np.int32)),
        jnp.asarray(t.astype(np.int32)),
        jnp.asarray(mask, jnp.float32),
        cfg,
        chunk,
        n_chunks,
        _regate_cell_fn(cell_fn, cfg, eval_batch),
    )
    return float(total) / usable


@functools.partial(
    jax.jit, static_argnames=("cfgs", "chunk", "n_chunks", "cell_fns")
)
def _score_streams_ensemble(
    params_tuple,
    x: jax.Array,
    t: jax.Array,
    mask: jax.Array,
    cfgs,
    chunk: int,
    n_chunks: int,
    cell_fns,
) -> jax.Array:
    """Sum of -log2( mean_i p_i(target) ) over the masked positions — a
    probability-space mixture of independently trained members, each
    carrying its own recurrent state across chunks."""
    e = x.shape[1]
    states = tuple(model.init_state(cfg, e) for cfg in cfgs)
    xc = x.reshape(n_chunks, chunk, e)
    tc = t.reshape(n_chunks, chunk, e)
    mc = mask.reshape(n_chunks, chunk, e)

    def body(carry, xt):
        states, acc = carry
        xi, ti, mi = xt
        new_states = []
        logps = []
        for p, cfg, cf, (h, c) in zip(params_tuple, cfgs, cell_fns, states):
            h_seq, (h, c) = model.forward(p, xi, h, c, cfg, cell_fn=cf)
            logits = model.logits_from_h(p, h_seq, cfg)
            logps.append(
                jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            )
            new_states.append((h, c))
        mix = jax.nn.logsumexp(jnp.stack(logps), axis=0) - jnp.log(
            float(len(logps))
        )
        nll = -jnp.take_along_axis(mix, ti[..., None], axis=-1)[..., 0]
        bits = nll / jnp.log(2.0)
        return (tuple(new_states), acc + jnp.sum(bits * mi)), None

    (_, total), _ = jax.lax.scan(
        body, (states, jnp.float32(0.0)), (xc, tc, mc)
    )
    return total


def evaluate_ensemble_bpc(
    members,
    test_data: np.ndarray,
    eval_batch: int = 16,
    chunk: int = 128,
    max_chars: Optional[int] = None,
) -> float:
    """bits/char of a probability-space ensemble over the held-out split.

    ``members``: sequence of ``(params, cfg, cell_fn)`` — architectures may
    differ per member (hidden width, depth, tying). Degenerates exactly to
    ``evaluate_bpc`` for a single member or identical members. The reference
    has no ensemble evaluator; this is post-processing capability layered
    over the same scoring semantics (``class_CUDA/lstm.cc:661-720``)."""
    if not members:
        raise ValueError("need at least one ensemble member")
    vocabs = {m[1].vocab for m in members}
    if len(vocabs) > 1:
        # jnp.stack over per-member log-probs requires one shared vocab;
        # fail with the actual mismatch instead of an opaque stack error
        raise ValueError(
            f"ensemble members must share one vocab, got {sorted(vocabs)}"
        )
    x, t, mask, usable, eval_batch, chunk, n_chunks = _build_streams(
        test_data, eval_batch, chunk, max_chars
    )
    params_tuple = tuple(m[0] for m in members)
    cfgs = tuple(m[1] for m in members)
    cell_fns = tuple(
        _regate_cell_fn(m[2], m[1], eval_batch) for m in members
    )
    total = _score_streams_ensemble(
        params_tuple,
        jnp.asarray(x.astype(np.int32)),
        jnp.asarray(t.astype(np.int32)),
        jnp.asarray(mask, jnp.float32),
        cfgs,
        chunk,
        n_chunks,
        cell_fns,
    )
    return float(total) / usable
