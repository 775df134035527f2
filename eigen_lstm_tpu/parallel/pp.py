"""Pipeline parallelism: stacked LSTM layers across a ``stage`` mesh axis
with sequence-chunk microbatching — a full *training* path.

A stacked LSTM's layer l consumes the *full hidden sequence* of layer l-1,
so layers can be pipelined over devices GPipe-style, with the sequence cut
into C chunks as the microbatch unit: at pipeline tick k, stage s processes
chunk ``k - s`` (when ``0 <= k-s < C``) through its block of
``layers_per_stage`` layers and hands the top hidden-sequence chunk to stage
s+1 over ICI (``ppermute``). Each stage carries its own per-layer (h, c)
recurrent state across *its* chunks in order, so the recurrence semantics
are exactly the single-device stacked scan. Total ticks = C + S - 1 for S
stages; bubble fraction = (S-1)/(C+S-1).

The whole schedule is one ``lax.scan`` over ticks inside ``shard_map``;
backward is ``jax.grad`` straight through the ``ppermute`` (its transpose is
the reverse permute), which yields the reverse pipeline schedule
automatically. The reference has no parallelism of any kind (SURVEY.md
§2.4) — this is TPU-native new capability; exactness vs the single-device
stacked model is gated by tests/test_pp.py (loss/grad AND a full
training-superstep parity test).

Layout: stage s holds layers [s·L/S, (s+1)·L/S). Because layer 0's input
weight is (M, 4N) (byte embedding) while other layers take (N, 4N), the
per-layer input weight is stored padded to (max(M, N), 4N); global layer 0
uses rows [0, M) as the embedding table, all others rows [0, N). Why/by
live replicated; only the last stage's loss contributes (vma-checked
shard_map reduces their gradients across stages automatically via the
pvary transpose).

Both reference loss modes are supported: ``loss_mode="all"`` scores every
timestep (``lstm_segment.cc:197-206``); ``"last"`` scores only t = S-1,
i.e. the final timestep of the final chunk on the final stage
(``class_batch/lstm.cc:308-317``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DataConfig, ModelConfig, TrainConfig
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


def pp_replicated_mask() -> PPParams:
    """Bool pytree marking params replicated across the stage axis — their
    grads come back already reduced (pvary transpose), so the optimizer's
    grad-norm psum must not multiply them by the stage count
    (optimizer.global_norm)."""
    return PPParams(W_pad=False, U=False, b=False, Why=True, by=True)


def pp_loss_fn(
    pp: PPParams,        # shard-local: leading dim = layers per stage
    ids: jax.Array,      # (S, B) replicated
    targets: jax.Array,  # (S, B) replicated
    h0: jax.Array,       # (lps, B, N) — this stage's per-layer state
    c0: jax.Array,
    cfg: ModelConfig,
    n_chunks: int,
    axis: str = "stage",
    dropout_key=None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array, jax.Array]]:
    """Pipelined forward + softmax-CE loss (both loss modes).
    Returns (loss, (hT, cT, mean_bits)); loss/mean_bits replicated across
    stages, hT/cT shard-local final recurrent state (for stream carry).

    ``dropout_key``: train-mode inter-layer + pre-head dropout (Zaremba'14,
    models.lstm.forward). Each layer's output chunk is masked by the stage
    that computes it before being handed up the ring, so the next stage
    consumes dropped activations exactly as the single-device stack does.
    The key is folded with (global layer index, chunk index) for an
    independent Bernoulli draw per activation element — a different
    (statistically equivalent) stream than the single-device (S, B, N) draw
    (same convention as DP's per-shard fold)."""
    s, b_ = ids.shape
    n = cfg.hidden
    n_stages = jax.lax.axis_size(axis)
    sidx = jax.lax.axis_index(axis)
    lps = pp.U.shape[0]  # layers per stage (shard-local leading dim)
    assert s % n_chunks == 0, "seq must divide into chunks"
    cl = s // n_chunks

    ids_chunks = ids.reshape(n_chunks, cl, b_)
    tgt_chunks = targets.reshape(n_chunks, cl, b_)
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def cell_scan(xw, h, c, U):
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

        my_ids = jax.lax.dynamic_index_in_dim(ids_chunks, chunk_idx, 0, False)
        # run the stage's block of layers on this chunk. Global layer 0
        # (stage 0, local 0) embeds its ids chunk; every other layer
        # transforms the hidden chunk below it. Both are computed (static
        # shapes) and selected, as in the single-layer schedule.
        x = buf
        new_h, new_c = [], []
        for j in range(lps):
            W = pp.W_pad[j]
            bvec = pp.b[j].astype(cfg.adtype)
            xw_hidden = cell_ops.matmul(
                x.reshape(cl * b_, n), W[:n], cfg.cdtype, cfg.adtype
            ).reshape(cl, b_, 4 * n)
            if j == 0:
                xw_embed = W[my_ids].astype(cfg.adtype)
                xw = jnp.where(sidx == 0, xw_embed, xw_hidden) + bvec
            else:
                xw = xw_hidden + bvec
            h_seq, hT, cT = cell_scan(xw, h[j], c[j], pp.U[j])
            if dropout_key is not None and cfg.dropout > 0.0:
                # mask this (global layer, chunk)'s output before it feeds
                # the next layer / the ring / the head (recurrent hT/cT stay
                # unmasked, as in models.lstm.forward)
                key_lj = jax.random.fold_in(
                    dropout_key,
                    (sidx * lps + j) * n_chunks + chunk_idx,
                )
                h_seq = model._dropout(h_seq, cfg.dropout, key_lj)
            x = h_seq
            new_h.append(jnp.where(active, hT, h[j]))
            new_c.append(jnp.where(active, cT, c[j]))
        h = jnp.stack(new_h)
        c = jnp.stack(new_c)

        # last stage scores its chunk
        my_tgt = jax.lax.dynamic_index_in_dim(tgt_chunks, chunk_idx, 0, False)
        is_last = sidx == n_stages - 1
        if cfg.loss_mode == "last":
            # only t = S-1 scores: final timestep of the final chunk
            logits = model.logits_from_h(
                model.LSTMParams((), pp.Why, pp.by), x[-1], cfg
            )
            chunk_bits = jnp.sum(model.softmax_xent_bits(logits, my_tgt[-1]))
            scored = active & is_last & (chunk_idx == n_chunks - 1)
        else:
            logits = model.logits_from_h(
                model.LSTMParams((), pp.Why, pp.by), x, cfg
            )
            chunk_bits = jnp.sum(model.softmax_xent_bits(logits, my_tgt))
            scored = active & is_last
        bits_acc = bits_acc + jnp.where(scored, chunk_bits, 0.0).astype(bits_acc.dtype)

        # hand the top hidden chunk to the next stage
        out_buf = x
        if n_stages > 1:
            out_buf = jax.lax.ppermute(x, axis, perm)
        return (out_buf.astype(cfg.pdtype), h, c, bits_acc), None

    def _varying(x):
        # the carried buffer/accumulator become stage-varying inside the
        # loop; mark the (invariant) initial values accordingly for the vma
        # typing — unioned with every axis the *inputs* vary on (e.g. the
        # data axis under the 2-D data x stage mesh, where ids/h0 are
        # batch-sharded)
        axes = {axis}
        for v in (ids, targets, h0, c0):
            axes |= getattr(jax.typeof(v), "vma", frozenset()) or frozenset()
        axes = tuple(sorted(axes))
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, axes, to="varying")
        return jax.lax.pvary(x, axes)

    buf0 = _varying(jnp.zeros((cl, b_, n), cfg.pdtype))
    bits0 = _varying(jnp.zeros((), cfg.adtype))
    (_, hT, cT, bits_acc), _ = jax.lax.scan(
        tick,
        (buf0, h0, c0, bits0),
        jnp.arange(n_chunks + n_stages - 1),
    )
    total = jax.lax.psum(bits_acc, axis)   # only the last stage contributed
    denom = b_ if cfg.loss_mode == "last" else s * b_
    mean_bits = total / denom
    loss = mean_bits if cfg.loss_base == "2" else mean_bits * model.LN2
    return loss, (hT, cT, mean_bits)


def _check_stages(num_layers: int, n_stages: int):
    if num_layers % n_stages != 0:
        raise ValueError(
            f"pipeline needs layers divisible by stages: {num_layers} layers "
            f"vs {n_stages} devices"
        )


def make_pp_loss_and_grad(
    mcfg: ModelConfig, mesh: Mesh, n_chunks: int, axis: str = "stage"
):
    """jitted ((loss, bits), grads) over the stage mesh. ``mcfg.num_layers``
    must divide evenly over the mesh; params via ``pp_params_from`` +
    ``shard_pp``."""
    _check_stages(mcfg.num_layers, mesh.devices.size)
    pspecs = pp_specs(axis)
    state_spec = P(axis, None, None)

    def local(pp, ids, targets, h0, c0):
        def loss_of(q):
            loss, (hT, cT, bits) = pp_loss_fn(
                q, ids, targets, h0, c0, mcfg, n_chunks, axis
            )
            return loss, bits

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


def make_pp_superstep(
    mcfg: ModelConfig,
    dcfg: DataConfig,
    tcfg: TrainConfig,
    corpus,
    mesh: Mesh,
    axis: str = "stage",
    donate: bool = True,
    length: int = None,
    streamed: bool = False,
):
    """Full jitted K-step *training* superstep over the stage mesh: window
    gather → pipelined fwd/bwd → Adagrad → cursor advance → stream-state
    carry, mirroring trainer.make_superstep step-for-step so PP training is
    bitwise-comparable to the single-device path (tests/test_pp.py).

    One documented exception: with ``reset_std > 0`` the stream-reset noise
    is drawn per stage (the stage index is folded into the key so stages
    decorrelate), which is a *different* random stream than the
    single-device trainer's one (L, B, N) draw — seeds are this framework's
    own convention (the reference's RNG is irreproducible, SURVEY.md §2.2),
    so PP-vs-single parity is exact only at reset_std = 0 (the default)."""
    from ..data import corpus as corpus_mod
    from ..train import optimizer as opt_mod
    from ..train.trainer import TrainState

    _check_stages(mcfg.num_layers, mesh.devices.size)
    length = int(corpus.shape[0]) if corpus is not None else int(length)
    stride = dcfg.effective_stride
    seq = dcfg.seq
    n_chunks = tcfg.pp_chunks
    if seq % n_chunks != 0:
        raise ValueError(f"seq {seq} not divisible by pp_chunks {n_chunks}")

    if streamed:
        # host-streamed windows (replicated across stages — every stage
        # needs x for layer 0 input and t for the head's loss)
        def window_fn(state, win):
            w = win.astype(jnp.int32)
            return w[:-1], w[1:]
    else:
        def window_fn(state, _):
            return corpus_mod.make_windows(corpus, state.positions, seq)

    def inner(state: TrainState, xs):
        x, t = window_fn(state, xs)
        # per-step dropout key, stage-invariant (each stage folds its own
        # global layer index inside pp_loss_fn)
        dkey = (
            jax.random.fold_in(state.key, state.step)
            if mcfg.dropout > 0.0 else None
        )

        def loss_of(q):
            return pp_loss_fn(
                q, x, t, state.h, state.c, mcfg, n_chunks, axis,
                dropout_key=dkey,
            )

        (loss, (h2, c2, bits)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state.params)
        if tcfg.skip_nonfinite:
            # loss is psum'd, so all stages agree on finiteness
            finite = jnp.isfinite(loss)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
            )
            h2 = jnp.where(finite, h2, state.h.astype(h2.dtype))
            c2 = jnp.where(finite, c2, state.c.astype(c2.dtype))
        newpos, wrapped = corpus_mod.advance_positions(
            state.positions, stride, length, seq
        )
        if dcfg.carry_state:
            key, sub = jax.random.split(state.key)
            mask = wrapped[None, :, None]
            if dcfg.reset_std > 0.0:
                sub = jax.random.fold_in(sub, jax.lax.axis_index(axis))
                kh, kc = jax.random.split(sub)
                rh = jax.random.normal(kh, h2.shape, h2.dtype) * dcfg.reset_std
                rc = jax.random.normal(kc, c2.shape, c2.dtype) * dcfg.reset_std
                from .tp import _pvary_if_invariant

                rh = _pvary_if_invariant(rh, axis)
                rc = _pvary_if_invariant(rc, axis)
            else:
                rh = jnp.zeros_like(h2)
                rc = jnp.zeros_like(c2)
            h2 = jnp.where(mask, rh, h2)
            c2 = jnp.where(mask, rc, c2)
        else:
            key = state.key
            h2 = jnp.zeros_like(state.h)
            c2 = jnp.zeros_like(state.c)
        params, m, gnorm = opt_mod.apply_updates(
            state.params, grads, state.m, state.step, tcfg, psum_axis=axis,
            replicated=pp_replicated_mask(),
        )
        return TrainState(params, m, h2, c2, newpos, state.step + 1, key), (bits, gnorm)

    def local_superstep(state: TrainState, *xs):
        state, (bits, gnorms) = jax.lax.scan(
            inner, state, xs[0] if xs else None,
            length=None if xs else tcfg.superstep,
        )
        return state, {
            "bits_mean": jnp.mean(bits),
            "bits_last": bits[-1],
            "gnorm_mean": jnp.mean(gnorms),
            "gnorm_max": jnp.max(gnorms),
        }

    pspecs = pp_specs(axis)
    state_specs = TrainState(
        params=pspecs,
        m=pspecs,
        h=P(axis, None, None),
        c=P(axis, None, None),
        positions=P(),
        step=P(),
        key=P(),
    )
    metrics_specs = {"bits_mean": P(), "bits_last": P(), "gnorm_mean": P(), "gnorm_max": P()}
    in_specs = (state_specs, P()) if streamed else (state_specs,)
    mapped = jax.shard_map(
        local_superstep,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(state_specs, metrics_specs),
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def make_dp_pp_superstep(
    mcfg: ModelConfig,
    dcfg: DataConfig,
    tcfg: TrainConfig,
    corpus,
    mesh: Mesh,
    data_axis: str = "data",
    stage_axis: str = "stage",
    donate: bool = True,
    length: int = None,
    streamed: bool = False,
):
    """2-D (data x stage) composition: the global batch is sharded over the
    data axis (each data-row owns its stream cursors, recurrent state and
    windows) and each data-row pipelines its layer stack over the stage axis
    exactly as the 1-D PP path does. The objective is the global mean loss:
    ``pmean over data`` inside the differentiated function makes the
    collective transposes emit globally-averaged gradients (the
    make_dp_tp_superstep recipe); stage-sharded grads need no further
    collective. Exactness vs single-device is gated by tests/test_pp.py."""
    from ..data import corpus as corpus_mod
    from ..train import optimizer as opt_mod
    from ..train.trainer import TrainState

    n_data = mesh.shape[data_axis]
    _check_stages(mcfg.num_layers, mesh.shape[stage_axis])
    if dcfg.batch % n_data != 0:
        raise ValueError(f"global batch {dcfg.batch} not divisible by {n_data}")
    length = int(corpus.shape[0]) if corpus is not None else int(length)
    stride = dcfg.effective_stride
    seq = dcfg.seq
    n_chunks = tcfg.pp_chunks
    if seq % n_chunks != 0:
        raise ValueError(f"seq {seq} not divisible by pp_chunks {n_chunks}")

    if streamed:
        def window_fn(state, win):
            w = win.astype(jnp.int32)
            return w[:-1], w[1:]
    else:
        def window_fn(state, _):
            return corpus_mod.make_windows(corpus, state.positions, seq)

    def inner(state: TrainState, xs):
        x, t = window_fn(state, xs)
        # per-step dropout key: decorrelated per data shard (each trains its
        # own batch slice), stage-invariant (pp_loss_fn folds layer indices)
        dkey = None
        if mcfg.dropout > 0.0:
            dkey = jax.random.fold_in(
                jax.random.fold_in(state.key, state.step),
                jax.lax.axis_index(data_axis),
            )

        def loss_of(q):
            loss, (h2, c2, bits) = pp_loss_fn(
                q, x, t, state.h, state.c, mcfg, n_chunks, stage_axis,
                dropout_key=dkey,
            )
            # global objective: mean over data shards — its transpose yields
            # globally-averaged gradients (see parallel/dp_tp.py)
            return jax.lax.pmean(loss, data_axis), (h2, c2, bits)

        (loss, (h2, c2, bits)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state.params)
        bits = jax.lax.pmean(bits, data_axis)
        if tcfg.skip_nonfinite:
            finite = jnp.isfinite(loss)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
            )
            h2 = jnp.where(finite, h2, state.h.astype(h2.dtype))
            c2 = jnp.where(finite, c2, state.c.astype(c2.dtype))
        newpos, wrapped = corpus_mod.advance_positions(
            state.positions, stride, length, seq
        )
        if dcfg.carry_state:
            key, sub = jax.random.split(state.key)
            mask = wrapped[None, :, None]
            if dcfg.reset_std > 0.0:
                sub = jax.random.fold_in(sub, jax.lax.axis_index(data_axis))
                sub = jax.random.fold_in(sub, jax.lax.axis_index(stage_axis))
                kh, kc = jax.random.split(sub)
                rh = jax.random.normal(kh, h2.shape, h2.dtype) * dcfg.reset_std
                rc = jax.random.normal(kc, c2.shape, c2.dtype) * dcfg.reset_std
            else:
                rh = jnp.zeros_like(h2)
                rc = jnp.zeros_like(c2)
            h2 = jnp.where(mask, rh, h2)
            c2 = jnp.where(mask, rc, c2)
        else:
            key = state.key
            h2 = jnp.zeros_like(state.h)
            c2 = jnp.zeros_like(state.c)
        params, m, gnorm = opt_mod.apply_updates(
            state.params, grads, state.m, state.step, tcfg,
            psum_axis=stage_axis, replicated=pp_replicated_mask(),
        )
        return TrainState(params, m, h2, c2, newpos, state.step + 1, key), (bits, gnorm)

    def local_superstep(state: TrainState, *xs):
        state, (bits, gnorms) = jax.lax.scan(
            inner, state, xs[0] if xs else None,
            length=None if xs else tcfg.superstep,
        )
        return state, {
            "bits_mean": jnp.mean(bits),
            "bits_last": bits[-1],
            "gnorm_mean": jnp.mean(gnorms),
            "gnorm_max": jnp.max(gnorms),
        }

    pspecs = pp_specs(stage_axis)
    state_specs = TrainState(
        params=pspecs,
        m=pspecs,
        h=P(stage_axis, data_axis, None),
        c=P(stage_axis, data_axis, None),
        positions=P(data_axis),
        step=P(),
        key=P(),
    )
    metrics_specs = {"bits_mean": P(), "bits_last": P(), "gnorm_mean": P(), "gnorm_max": P()}
    in_specs = (
        (state_specs, P(None, None, data_axis)) if streamed else (state_specs,)
    )
    mapped = jax.shard_map(
        local_superstep,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(state_specs, metrics_specs),
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def make_mesh_dp_pp(n_data: int, n_stage: int, devices=None) -> Mesh:
    from .dp_tp import make_mesh_2d

    return make_mesh_2d(n_data, n_stage, devices, ("data", "stage"))


def shard_dp_pp_state(state, mesh: Mesh, data_axis: str = "data",
                      stage_axis: str = "stage"):
    """Place a TrainState whose params/m are already in PPParams layout onto
    the (data x stage) mesh."""
    from ..train.trainer import TrainState

    pspecs = pp_specs(stage_axis)
    put = lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp))
    return TrainState(
        params=jax.tree_util.tree_map(put, state.params, pspecs),
        m=jax.tree_util.tree_map(put, state.m, pspecs),
        h=put(state.h, P(stage_axis, data_axis, None)),
        c=put(state.c, P(stage_axis, data_axis, None)),
        positions=put(state.positions, P(data_axis)),
        step=put(state.step, P()),
        key=put(state.key, P()),
    )


def shard_pp(pp: PPParams, mesh: Mesh, axis: str = "stage") -> PPParams:
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), pp, pp_specs(axis)
    )


def shard_pp_state(state, mesh: Mesh, axis: str = "stage"):
    """Place a TrainState whose params/m are already in PPParams layout onto
    the stage mesh (h/c (L, B, N) split layer-wise across stages)."""
    from ..train.trainer import TrainState

    pspecs = pp_specs(axis)
    put = lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp))
    return TrainState(
        params=jax.tree_util.tree_map(put, state.params, pspecs),
        m=jax.tree_util.tree_map(put, state.m, pspecs),
        h=put(state.h, P(axis, None, None)),
        c=put(state.c, P(axis, None, None)),
        positions=put(state.positions, P()),
        step=put(state.step, P()),
        key=put(state.key, P()),
    )
