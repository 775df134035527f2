"""Pipeline parallelism: stacked LSTM layers across a ``stage`` mesh axis
with sequence-chunk microbatching.

A stacked LSTM's layer l consumes the *full hidden sequence* of layer l-1,
so layers can be pipelined over devices GPipe-style, with the sequence cut
into C chunks as the microbatch unit: at pipeline tick k, stage l processes
chunk ``k - l`` (when ``0 <= k-l < C``) and hands its hidden-sequence chunk
to stage l+1 over ICI (``ppermute``). Each stage carries its own (h_l, c_l)
recurrent state across *its* chunks in order, so the recurrence semantics
are exactly the single-device stacked scan. Total ticks = C + L - 1; bubble
fraction = (L-1)/(C+L-1).

The whole schedule is one ``lax.scan`` over ticks inside ``shard_map``;
backward is ``jax.grad`` straight through the ``ppermute`` (its transpose is
the reverse permute), which yields the reverse pipeline schedule
automatically. The reference has no parallelism of any kind (SURVEY.md
§2.4) — this is TPU-native new capability; exactness vs the single-device
stacked model is gated by tests/test_pp.py.

Layout: stage s holds layer s's weights. Because layer 0's input weight is
(M, 4N) (byte embedding) while layers >0 take (N, 4N), the per-stage input
weight is stored padded to (max(M, N), 4N); stage 0 uses rows [0, M) as the
embedding table, other stages use rows [0, N). Why/by live replicated; only
the last stage's loss contributes (vma-checked shard_map reduces their
gradients across stages automatically).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..models import lstm as model
from ..ops import cell as cell_ops


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PPParams:
    """Stage-stacked parameters. W_pad: (L, Dmax, 4N); U: (L, N, 4N);
    b: (L, 4N); Why: (N, M) replicated; by: (M,) replicated."""

    W_pad: jax.Array
    U: jax.Array
    b: jax.Array
    Why: jax.Array
    by: jax.Array


def pp_params_from(params: model.LSTMParams, cfg: ModelConfig) -> PPParams:
    """Stack LSTMParams into the stage-major padded layout."""
    n, m = cfg.hidden, cfg.vocab
    dmax = max(m, n)
    w_pad = []
    for l, layer in enumerate(params.layers):
        din = layer.W.shape[0]
        pad = np.zeros((dmax, 4 * n), dtype=np.asarray(layer.W).dtype)
        pad[:din] = np.asarray(layer.W)
        w_pad.append(pad)
    return PPParams(
        W_pad=jnp.asarray(np.stack(w_pad)),
        U=jnp.stack([l.U for l in params.layers]),
        b=jnp.stack([l.b for l in params.layers]),
        Why=params.Why,
        by=params.by,
    )


def pp_params_to(pp: PPParams, cfg: ModelConfig) -> model.LSTMParams:
    """Inverse of ``pp_params_from`` (canonical layout for eval/checkpoints)."""
    n, m = cfg.hidden, cfg.vocab
    layers = []
    for l in range(cfg.num_layers):
        din = m if l == 0 else n
        layers.append(
            model.LayerParams(pp.W_pad[l, :din], pp.U[l], pp.b[l])
        )
    return model.LSTMParams(tuple(layers), pp.Why, pp.by)


def pp_specs(axis: str = "stage") -> PPParams:
    return PPParams(
        W_pad=P(axis, None, None),
        U=P(axis, None, None),
        b=P(axis, None),
        Why=P(),
        by=P(),
    )


def pp_loss_fn(
    pp: PPParams,        # shard-local: leading stage dim is 1
    ids: jax.Array,      # (S, B) replicated
    targets: jax.Array,  # (S, B) replicated
    h0: jax.Array,       # (1, B, N) — this stage's layer state
    c0: jax.Array,
    cfg: ModelConfig,
    n_chunks: int,
    axis: str = "stage",
) -> Tuple[jax.Array, jax.Array]:
    """Pipelined forward + softmax-CE loss (loss_mode='all').
    Returns (loss, mean_bits), replicated across stages."""
    s, b_ = ids.shape
    n = cfg.hidden
    n_stages = jax.lax.axis_size(axis)
    sidx = jax.lax.axis_index(axis)
    assert s % n_chunks == 0, "seq must divide into chunks"
    cl = s // n_chunks

    W = pp.W_pad[0]
    U = pp.U[0]
    bvec = pp.b[0].astype(cfg.adtype)
    ids_chunks = ids.reshape(n_chunks, cl, b_)
    tgt_chunks = targets.reshape(n_chunks, cl, b_)
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def cell_scan(xw, h, c):
        def step(carry, xw_t):
            h_prev, c_prev = carry
            g_pre = xw_t + cell_ops.matmul(h_prev, U, cfg.cdtype)
            h2, c2 = cell_ops.cell_step(
                g_pre, c_prev.astype(cfg.adtype), n, cfg.cell_variant
            )
            return (h2.astype(cfg.pdtype), c2.astype(cfg.pdtype)), h2

        (hT, cT), h_seq = jax.lax.scan(step, (h, c), xw)
        return h_seq, hT, cT

    def tick(carry, k):
        buf, h, c, bits_acc = carry
        chunk_idx = jnp.clip(k - sidx, 0, n_chunks - 1)
        active = (k >= sidx) & (k - sidx < n_chunks)

        # stage 0 embeds its ids chunk; later stages transform the received
        # hidden chunk. Both are computed (static shapes) and selected.
        my_ids = jax.lax.dynamic_index_in_dim(ids_chunks, chunk_idx, 0, False)
        xw_embed = W[my_ids].astype(cfg.adtype)
        xw_hidden = cell_ops.matmul(
            buf.reshape(cl * b_, n), W[:n], cfg.cdtype, cfg.adtype
        ).reshape(cl, b_, 4 * n)
        xw = jnp.where(sidx == 0, xw_embed, xw_hidden) + bvec

        h_seq, hT, cT = cell_scan(xw, h, c)
        h = jnp.where(active, hT, h)
        c = jnp.where(active, cT, c)

        # last stage scores its chunk
        my_tgt = jax.lax.dynamic_index_in_dim(tgt_chunks, chunk_idx, 0, False)
        logits = model.logits_from_h(
            model.LSTMParams((), pp.Why, pp.by), h_seq, cfg
        )
        chunk_bits = jnp.sum(model.softmax_xent_bits(logits, my_tgt))
        is_last = sidx == n_stages - 1
        bits_acc = bits_acc + jnp.where(active & is_last, chunk_bits, 0.0)

        # hand the hidden chunk to the next stage
        out_buf = h_seq
        if n_stages > 1:
            out_buf = jax.lax.ppermute(h_seq, axis, perm)
        return (buf_like(out_buf), h, c, bits_acc), None

    def buf_like(x):
        return x.astype(cfg.pdtype)

    def _varying(x):
        # the carried buffer/accumulator become stage-varying inside the loop;
        # mark the (invariant) initial values accordingly for the vma typing
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, (axis,), to="varying")
        return jax.lax.pvary(x, (axis,))

    buf0 = _varying(jnp.zeros((cl, b_, n), cfg.pdtype))
    bits0 = _varying(jnp.zeros((), jnp.float32))
    (_, _, _, bits_acc), _ = jax.lax.scan(
        tick,
        (buf0, h0[0], c0[0], bits0),
        jnp.arange(n_chunks + n_stages - 1),
    )
    total = jax.lax.psum(bits_acc, axis)   # only the last stage contributed
    mean_bits = total / (s * b_)
    loss = mean_bits if cfg.loss_base == "2" else mean_bits * model.LN2
    return loss, mean_bits


def make_pp_loss_and_grad(
    mcfg: ModelConfig, mesh: Mesh, n_chunks: int, axis: str = "stage"
):
    """jitted ((loss, bits), grads) over the stage mesh. ``mcfg.num_layers``
    must equal the mesh size; params via ``pp_params_from`` + ``shard_pp``."""
    if mcfg.num_layers != mesh.devices.size:
        raise ValueError(
            f"pipeline needs one stage per layer: {mcfg.num_layers} layers "
            f"vs {mesh.devices.size} devices"
        )
    pspecs = pp_specs(axis)
    state_spec = P(axis, None, None)

    def local(pp, ids, targets, h0, c0):
        def loss_of(q):
            return pp_loss_fn(q, ids, targets, h0, c0, mcfg, n_chunks, axis)

        (loss, bits), grads = jax.value_and_grad(loss_of, has_aux=True)(pp)
        # Why/by live replicated; under vma-checked shard_map their grads
        # come back already reduced across stages (the transpose of the loss
        # psum) — no explicit collective needed
        return loss, bits, grads

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(pspecs, P(), P(), state_spec, state_spec),
        out_specs=(P(), P(), pspecs),
    )
    return jax.jit(mapped)


def shard_pp(pp: PPParams, mesh: Mesh, axis: str = "stage") -> PPParams:
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), pp, pp_specs(axis)
    )
