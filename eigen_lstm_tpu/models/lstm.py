"""Stacked character-LSTM language model — TPU-first JAX implementation.

Parity target: the ``LSTM<S>``/``Parameters`` model of the reference
(``/root/reference/optimized-obsfuscated_versions/lstm_eigen_class_CUDA/lstm.h:114-397``),
generalized to multi-layer stacks and mixed precision.

TPU-first design decisions (vs the reference's per-timestep GEMM loop):

* The input-to-gate contribution ``W·x_t`` for every timestep is hoisted out
  of the recurrence: layer 0 consumes byte ids and gathers rows of W
  (one-hot ⇒ the GEMM *is* a gather, root ``lstm.cc:169``); layers ≥ 1
  consume the full (S·B, N) hidden sequence of the layer below in one large
  MXU GEMM. Only the unavoidable ``h_{t-1}·U`` GEMM stays inside the
  ``lax.scan`` recurrence.
* State layout is row-major (B, N) / gates (B, 4N) so batch → MXU sublanes,
  features → lanes (the reference is column-major (4N, B)).
* The whole S-step forward + loss + BPTT lives under one jit; there is no
  per-step host↔device traffic (the reference copies the full window H↔D
  every character step, ``class_CUDA/lstm.cc:274-375`` — its chief
  inefficiency, SURVEY.md §3.3).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import cell as cell_ops

LN2 = 0.6931471805599453


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LayerParams:
    """One LSTM layer. W: (in_dim, 4N) input→gates; U: (N, 4N) recurrent;
    b: (4N,). Mirrors the reference ``Parameters`` members W/U/b
    (``class_CUDA/lstm.h:43-60``), transposed for row-major TPU layout."""

    W: jax.Array
    U: jax.Array
    b: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LSTMParams:
    """Full model: stacked layers + softmax head (Why: (N, M), by: (M,)),
    the reference's five-tensor set {W, U, b, Why, by}
    (``class_CUDA/lstm.h:43-60``) generalized to ``num_layers``."""

    layers: Tuple[LayerParams, ...]
    Why: jax.Array
    by: jax.Array


def init_params(cfg: ModelConfig, key: Optional[jax.Array] = None) -> LSTMParams:
    """W,U,Why ~ N(0, init_std), biases 0, forget-gate bias = ``forget_bias``
    (root ``lstm.cc:113-115``; ``class_batch/lstm.cc:80-81``). Seeded and
    reproducible, unlike the reference's per-call ``std::random_device``
    mt19937 (root ``lstm.cc:370-371``)."""
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    n, m, dt = cfg.hidden, cfg.vocab, cfg.pdtype
    layers = []
    for l in range(cfg.num_layers):
        # tied: layer 0 consumes the (N-dim) shared embedding Why^T[id]
        # through an (N, 4N) projection (see ModelConfig.tie_embeddings)
        in_dim = n if (l == 0 and cfg.tie_embeddings) else (m if l == 0 else n)
        key, kw, ku = jax.random.split(key, 3)
        W = (jax.random.normal(kw, (in_dim, 4 * n)) * cfg.init_std).astype(dt)
        U = (jax.random.normal(ku, (n, 4 * n)) * cfg.init_std).astype(dt)
        b = jnp.zeros((4 * n,), dt)
        _, _, sf, _ = cell_ops.gate_slices(n)
        b = b.at[sf].set(jnp.asarray(cfg.forget_bias, dt))
        layers.append(LayerParams(W, U, b))
    key, ky = jax.random.split(key)
    Why = (jax.random.normal(ky, (n, m)) * cfg.init_std).astype(dt)
    by = jnp.zeros((m,), dt)
    return LSTMParams(tuple(layers), Why, by)


def init_state(
    cfg: ModelConfig, batch: int, reset_std: float = 0.0, key: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """(h, c) each (L, B, N). h0,c0 ~ N(0, reset_std); the reference uses
    sigma ∈ {0.1, 0.01, 0} across variants and 0.0 in the final driver
    (``class_CUDA/lstm.cc:45,178-179``)."""
    shape = (cfg.num_layers, batch, cfg.hidden)
    if reset_std == 0.0 or key is None:
        # two distinct buffers: h and c may be donated separately under jit
        return jnp.zeros(shape, cfg.pdtype), jnp.zeros(shape, cfg.pdtype)
    kh, kc = jax.random.split(key)
    h = (jax.random.normal(kh, shape) * reset_std).astype(cfg.pdtype)
    c = (jax.random.normal(kc, shape) * reset_std).astype(cfg.pdtype)
    return h, c


def _scan_layer(
    layer: LayerParams,
    xw: jax.Array,          # (S, B, 4N) precomputed x@W contributions
    h0: jax.Array,          # (B, N)
    c0: jax.Array,          # (B, N)
    cfg: ModelConfig,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """scan the recurrence h_t = cell(xw_t + h_{t-1}@U, c_{t-1}).

    The bias is pre-folded into ``xw`` by ``forward`` (it is time-invariant,
    so folding it into the hoisted x@W GEMM removes an add from the scan).
    Replaces the hand-rolled C++ timestep loop (root ``lstm.cc:173-209``).
    Returns (h_seq (S,B,N), (hT, cT)).
    """
    n = cfg.hidden
    U = layer.U

    def step(carry, xw_t):
        h_prev, c_prev = carry
        g_pre = xw_t + cell_ops.matmul(h_prev, U, cfg.cdtype)
        h, c = cell_ops.cell_step(g_pre, c_prev.astype(cfg.adtype), n, cfg.cell_variant)
        h = h.astype(cfg.pdtype)
        c = c.astype(cfg.pdtype)
        return (h, c), h

    if cfg.remat:
        # trade recompute for BPTT activation memory at long S / large N
        step = jax.checkpoint(step)
    # the carry lives in param dtype; stream state arrives as f32
    (hT, cT), h_seq = jax.lax.scan(
        step, (h0.astype(cfg.pdtype), c0.astype(cfg.pdtype)), xw
    )
    return h_seq, (hT, cT)


def _chunked_seq(fn, seq_arg: jax.Array, h0: jax.Array, c0: jax.Array,
                 chunk: int):
    """Run a whole-sequence layer op chunk-wise with rematerialization:
    ``fn(x_chunk, h, c) -> (h_seq, (hT, cT))`` is scanned over S/chunk
    time chunks under ``jax.checkpoint``, so during BPTT only the chunk
    being differentiated holds its gate/cell residuals (the rest are
    recomputed from the chunk-boundary (h, c) states). See
    ModelConfig.scan_chunk."""
    s = seq_arg.shape[0]
    n_chunks = s // chunk

    @jax.checkpoint
    def body(carry, x_c):
        h, c = carry
        h_seq, (hT, cT) = fn(x_c, h, c)
        return (hT, cT), h_seq

    xs = seq_arg.reshape(n_chunks, chunk, *seq_arg.shape[1:])
    (hT, cT), hs = jax.lax.scan(body, (h0, c0), xs)
    return hs.reshape(s, *hs.shape[2:]), (hT, cT)


def _maybe_chunk(cfg: ModelConfig, s: int):
    """Chunk size to use for this window, or 0 (off / not divisible)."""
    ck = cfg.scan_chunk
    return ck if ck and 0 < ck < s and s % ck == 0 else 0


def _dropout(x: jax.Array, rate: float, key: jax.Array) -> jax.Array:
    """Inverted dropout (train-time scaling, identity at eval).

    Masks come from ``lax.rng_bit_generator`` (the TPU's hardware RNG
    instruction) instead of the counter-based threefry stream — cheaper on
    the VPU, though measured flat on the 3x1024 flagship step: the
    dropout cost there is the extra HBM traffic of masking the (S, B, N)
    hidden streams (~1.2 GB/step), not the RNG itself. Dropout masks need
    no cross-backend reproducibility — only determinism within a run,
    which RBG's keyed stream provides."""
    keep = 1.0 - rate
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    k4 = jnp.concatenate([kd, kd])[:4]
    _, bits = jax.lax.rng_bit_generator(k4, x.shape, dtype=jnp.uint32)
    thresh = jnp.uint32(int(keep * (2**32 - 1)))
    return jnp.where(
        bits <= thresh, x / jnp.asarray(keep, x.dtype), jnp.zeros_like(x)
    )


def _drop_seed(key: jax.Array, l: int) -> jax.Array:
    """(1,) int32 seed for the fused in-kernel dropout mask of layer ``l``
    (ops/pallas_cell.py _keep_mask). Derived per (step key, layer) so masks
    differ across layers and training steps."""
    return (
        jax.random.bits(jax.random.fold_in(key, l), (), jnp.uint32)
        .astype(jnp.int32)
        .reshape(1)
    )


def _substitute_tied_embed(params: LSTMParams, cfg: ModelConfig) -> LSTMParams:
    """Tied embeddings (ModelConfig.tie_embeddings): replace layer-0's input
    weight with ``W_eff = Why^T @ W0`` — (M, N) @ (N, 4N), a tiny GEMM — so
    byte id ``i``'s gate contribution is ``Why^T[i] @ W0``, i.e. the shared
    embedding row pushed through the input projection. Everything downstream
    (one-hot/gather embedding modes, the fused-embed Pallas kernel and its
    custom VJP) sees an ordinary (M, 4N) weight; AD chains dW_eff back into
    both Why and W0. No-op when untied."""
    if not cfg.tie_embeddings:
        return params
    l0 = params.layers[0]
    w_eff = cell_ops.matmul(
        params.Why.T, l0.W, cfg.cdtype, cfg.adtype
    ).astype(cfg.pdtype)
    return dataclasses.replace(
        params, layers=(dataclasses.replace(l0, W=w_eff),) + params.layers[1:]
    )


def forward(
    params: LSTMParams,
    ids: jax.Array,               # (S, B) int32 byte ids
    h0: jax.Array,                # (L, B, N)
    c0: jax.Array,                # (L, B, N)
    cfg: ModelConfig,
    cell_fn=None,
    dropout_key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Full forward: returns (h_seq of top layer (S,B,N), (hL, cL) stacked).

    ``cell_fn``: optional override for the per-layer sequence recurrence with
    signature ``(layer, xw, h0, c0, cfg) -> (h_seq, (hT, cT))`` — the hook
    through which the fused Pallas kernel is swapped in (ops/pallas_cell.py),
    exactly where the reference swaps Eigen for cuBLAS (SURVEY.md §3.3).

    ``dropout_key``: when given and ``cfg.dropout > 0``, applies dropout to
    the non-recurrent connections (each layer's output hidden sequence,
    i.e. between stacked layers and before the head — Zaremba'14). ``None``
    = eval mode. The recurrence itself is untouched, so the Pallas kernels
    see ordinary inputs.
    """
    scan_fn = cell_fn or _scan_layer
    s, b_ = ids.shape
    x = None
    h_last, c_last = [], []
    drop = cfg.dropout if dropout_key is not None else 0.0
    embed_fn = getattr(cell_fn, "embed_layer0", None)
    ck = _maybe_chunk(cfg, s)
    # fused in-kernel dropout: mask applied in the producer kernel's
    # epilogue and regenerated in its backward prologue — removes XLA's
    # separate read-mask-write passes over the (S, B, N) hidden streams
    # (~1.2 GB/step at 3x1024). Different RNG stream than _dropout
    # (statistically equivalent; both deterministic per step key). The
    # chunked-remat path keeps the XLA mask (chunk-local timesteps would
    # decorrelate the fwd/bwd masks).
    fdrop = (
        drop > 0.0 and not ck and getattr(cell_fn, "fused_dropout", False)
    )
    params = _substitute_tied_embed(params, cfg)
    for l, layer in enumerate(params.layers):
        if l == 0 and embed_fn is not None:
            # layer-0 embedding fused into the kernel (no xw stream)
            if ck:
                h_seq, (hT, cT) = _chunked_seq(
                    lambda x_c, h, c: embed_fn(layer, x_c, h, c, cfg),
                    ids, h0[0], c0[0], ck,
                )
            elif fdrop:
                h_seq, (hT, cT) = embed_fn(
                    layer, ids, h0[0], c0[0], cfg,
                    dropout=(drop, _drop_seed(dropout_key, 0)),
                )
            else:
                h_seq, (hT, cT) = embed_fn(layer, ids, h0[0], c0[0], cfg)
            if drop > 0.0 and not fdrop:
                h_seq = _dropout(
                    h_seq, drop, jax.random.fold_in(dropout_key, 0)
                )
            x = h_seq
            h_last.append(hT)
            c_last.append(cT)
            continue
        if l == 0:
            # one-hot @ W == row gather of W (root lstm.cc:169). "onehot"
            # mode keeps it a GEMM so the backward (dW) is a GEMM too,
            # instead of a TPU-hostile scatter-add.
            if cfg.embedding_mode == "onehot":
                oh = cell_ops.one_hot(ids, cfg.vocab, cfg.cdtype)
                xw = cell_ops.matmul(
                    oh.reshape(s * b_, cfg.vocab), layer.W, cfg.cdtype,
                    cfg.adtype,
                ).reshape(s, b_, -1)
                xw = xw + layer.b.astype(cfg.adtype)
            elif cfg.embedding_mode == "auto":
                xw = cell_ops.embed(layer.W, ids, cfg.cdtype, cfg.adtype)
                xw = xw + layer.b.astype(cfg.adtype)
            else:
                xw = layer.W[ids].astype(cfg.adtype) + layer.b.astype(cfg.adtype)
        else:
            flat = x.reshape(s * b_, -1)
            xw = cell_ops.matmul(flat, layer.W, cfg.cdtype).reshape(s, b_, -1)
            xw = xw + layer.b.astype(cfg.adtype)
        if ck:
            h_seq, (hT, cT) = _chunked_seq(
                lambda x_c, h, c: scan_fn(layer, x_c, h, c, cfg),
                xw, h0[l], c0[l], ck,
            )
        elif fdrop:
            h_seq, (hT, cT) = scan_fn(
                layer, xw, h0[l], c0[l], cfg,
                dropout=(drop, _drop_seed(dropout_key, l)),
            )
        else:
            h_seq, (hT, cT) = scan_fn(layer, xw, h0[l], c0[l], cfg)
        if drop > 0.0 and not fdrop:
            h_seq = _dropout(h_seq, drop, jax.random.fold_in(dropout_key, l))
        x = h_seq
        h_last.append(hT)
        c_last.append(cT)
    return x, (jnp.stack(h_last), jnp.stack(c_last))


def logits_from_h(params: LSTMParams, h: jax.Array, cfg: ModelConfig) -> jax.Array:
    """y = h @ Why + by (root ``lstm.cc:195``). h: (..., N) -> (..., M)."""
    flat = h.reshape(-1, h.shape[-1])
    y = cell_ops.matmul(flat, params.Why, cfg.cdtype) + params.by.astype(cfg.adtype)
    return y.reshape(*h.shape[:-1], cfg.vocab)


def softmax_xent_bits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Per-example cross entropy in *bits*: -log2 p(target), the reference's
    reported unit (root ``lstm.cc:204,291``). Stabilized by max-subtraction
    (``class_batch/lstm.h:175``). logits (..., M), targets (...) int."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return nll / LN2


def loss_fn(
    params: LSTMParams,
    ids: jax.Array,        # (S, B)
    targets: jax.Array,    # (S, B)
    h0: jax.Array,
    c0: jax.Array,
    cfg: ModelConfig,
    cell_fn=None,
    dropout_key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Tuple[Tuple[jax.Array, jax.Array], jax.Array]]:
    """Training objective. Returns (loss, ((hL, cL), mean_bits_per_char)).

    ``loss_mode="last"`` counts only t = S-1 (``class_batch/lstm.cc:308-317``);
    ``"all"`` counts every step (``lstm_segment.cc:197-206``). The objective
    is scaled to ``loss_base`` (ln vs log2 inconsistency across reference
    variants, SURVEY.md §2.2 item 7); metrics are always bits.
    ``dropout_key``: train-mode dropout (see ``forward``); None = eval.
    """
    h_seq, state = forward(
        params, ids, h0, c0, cfg, cell_fn=cell_fn, dropout_key=dropout_key
    )
    s, b_ = ids.shape
    head_fn = getattr(cell_fn, "fused_head", None)
    if cfg.loss_mode == "last":
        logits = logits_from_h(params, h_seq[-1], cfg)
        bits = softmax_xent_bits(logits, targets[-1])
        mean_bits = jnp.mean(bits)
    elif head_fn is not None and head_fn.supported(cfg, s * b_):
        # fused softmax-CE head kernel: logits/probs/dlogits never hit HBM
        # (ops/pallas_head.py)
        bits_sum = head_fn(
            params, h_seq.reshape(s * b_, -1), targets.reshape(-1), cfg
        )
        mean_bits = bits_sum / (s * b_)
    else:
        logits = logits_from_h(params, h_seq, cfg)
        bits = softmax_xent_bits(logits, targets)
        mean_bits = jnp.mean(bits)
    loss = mean_bits if cfg.loss_base == "2" else mean_bits * LN2
    return loss, (state, mean_bits)


def forward_step(
    params: LSTMParams,
    ids: jax.Array,        # (B,) int32 — one character per stream
    h: jax.Array,          # (L, B, N)
    c: jax.Array,          # (L, B, N)
    cfg: ModelConfig,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Single-timestep advance — the sampling/eval path
    (``class_CUDA/lstm.cc:636-654``). Returns (logits (B, M), (h, c))."""
    params = _substitute_tied_embed(params, cfg)
    x = None
    hs, cs = [], []
    for l, layer in enumerate(params.layers):
        if l == 0:
            g_in = layer.W[ids].astype(cfg.adtype)
        else:
            g_in = cell_ops.matmul(x, layer.W, cfg.cdtype)
        g_pre = g_in + cell_ops.matmul(h[l], layer.U, cfg.cdtype) + layer.b.astype(cfg.adtype)
        hl, cl = cell_ops.cell_step(
            g_pre, c[l].astype(cfg.adtype), cfg.hidden, cfg.cell_variant
        )
        x = hl
        hs.append(hl.astype(cfg.pdtype))
        cs.append(cl.astype(cfg.pdtype))
    logits = logits_from_h(params, x, cfg)
    return logits, (jnp.stack(hs), jnp.stack(cs))
