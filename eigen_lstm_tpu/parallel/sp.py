"""Sequence pipelining: the *time axis* of the recurrence across a ``seq``
mesh axis — the other pipeline axis from layer-stage PP (parallel/pp.py).

An LSTM's recurrence is sequential in t, so the S-step window cannot be
time-parallelized directly (SURVEY.md §7 "hard parts"). It CAN be
pipelined: cut the window into D contiguous time segments (device d owns
steps [d·S/D, (d+1)·S/D)) and cut the batch into C microchunks as the
pipeline unit. At tick k, device d runs its *whole layer stack* over its
time segment for microchunk ``k - d`` and hands the resulting per-layer
(h, c) carry to device d+1 over ICI (``ppermute``) — microchunk j's
segments execute in time order across devices, so the math is exactly the
single-device scan. Total ticks = C + D - 1; bubble fraction (D-1)/(C+D-1).

When to use it over DP: DP shards the batch, so per-device batch shrinks
and the MXU starves at small B (the U GEMM loses its batch dimension); SP
keeps the *full* microchunk batch on every device and shards wall-clock
time instead — the right axis when B is already at the MXU knee but S is
long (the reference's own scaling axis: windows up to S=100,
``models/enwik8_newton_N400_S100_B1024*``, SURVEY.md §5 long-context).

Parameters are fully replicated (every device runs every layer), so
gradient reduction is the automatic vma transpose of the loss psum —
no hand-written collective. Backward is ``jax.grad`` through ``ppermute``
(its transpose is the reverse permute), which yields the reverse pipeline
schedule for free. Exactness vs the single-device trainer is gated by
tests/test_sp.py — including ``reset_std > 0`` (state is replicated, so
the reset RNG stream is bit-identical to the single-device trainer's,
unlike DP/PP whose per-shard folds decorrelate).

The reference has no parallelism of any kind (SURVEY.md §2.4); this is
TPU-native new capability.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DataConfig, ModelConfig, TrainConfig
from ..models import lstm as model


def _varying(x, axis):
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axes, to="varying")
    return jax.lax.pvary(x, axes)


def sp_loss_fn(
    params: model.LSTMParams,   # replicated (TP-sharded when tp_axis given)
    ids: jax.Array,             # (S, B) replicated
    targets: jax.Array,         # (S, B) replicated
    h0: jax.Array,              # (L, B, N) replicated ((L, B, N/Dm) TP shard)
    c0: jax.Array,
    cfg: ModelConfig,
    n_chunks: int,
    axis: str = "seq",
    cell_fn=None,
    tp_axis: str = None,
    tp_backend: str = "xla",
    dropout_key=None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array, jax.Array]]:
    """Pipelined forward + softmax-CE loss over time segments.
    Returns (loss, (hT, cT, mean_bits)) — all replicated across the axis
    (hT/cT are psum-broadcast from the final segment's device).

    ``tp_axis``: compose with gate-sharded tensor parallelism — each time
    segment runs ``tp.tp_stack_forward`` over the model axis (weights and
    recurrent state sharded N/Dm per device), the head is the row-sharded
    ``tp.tp_head_logits``, and the carries handed up the seq ring are the
    model-axis *shards* (ppermute moves (L, bs, N/Dm) — Dm-fold less ICI
    traffic than unsharded SP).

    ``dropout_key``: train-mode inter-layer + pre-head dropout. Each
    (time segment, batch microchunk) draws its own mask stream — the key is
    folded with ``sidx * n_chunks + j`` so every activation element gets an
    independent Bernoulli draw, deterministically per step key. This is a
    *different* (statistically equivalent) stream than the single-device
    (S, B, N) draw, so dropout>0 SP runs are valid but not bit-identical to
    single-device dropout runs (same convention as DP's per-shard fold).
    Must be model-axis-invariant under ``tp_axis`` (mask applies to the
    all-gathered full hidden sequence)."""
    s, b_ = ids.shape
    d = jax.lax.axis_size(axis)
    sidx = jax.lax.axis_index(axis)
    assert s % d == 0, "seq must divide the seq-mesh size"
    assert b_ % n_chunks == 0, "batch must divide into chunks"
    seg = s // d
    bs = b_ // n_chunks
    nl = len(params.layers)
    n = cfg.hidden
    if tp_axis is not None:
        from . import tp as tp_mod

        n = cfg.hidden // jax.lax.axis_size(tp_axis)   # shard-local width

    # this device's time rows, cut into batch microchunks (C, seg, bs)
    ids_seg = jax.lax.dynamic_slice_in_dim(ids, sidx * seg, seg, 0)
    tgt_seg = jax.lax.dynamic_slice_in_dim(targets, sidx * seg, seg, 0)
    ids_chunks = ids_seg.reshape(seg, n_chunks, bs).transpose(1, 0, 2)
    tgt_chunks = tgt_seg.reshape(seg, n_chunks, bs).transpose(1, 0, 2)
    perm = [(i, i + 1) for i in range(d - 1)]

    def tick(carry, k):
        buf_h, buf_c, bits_acc, hT_acc, cT_acc = carry
        j = jnp.clip(k - sidx, 0, n_chunks - 1)
        active = (k >= sidx) & (k - sidx < n_chunks)

        my_ids = jax.lax.dynamic_index_in_dim(ids_chunks, j, 0, False)
        my_tgt = jax.lax.dynamic_index_in_dim(tgt_chunks, j, 0, False)
        # per-(segment, microchunk) dropout stream (see docstring)
        seg_key = (
            jax.random.fold_in(dropout_key, sidx * n_chunks + j)
            if dropout_key is not None else None
        )
        # segment 0 starts from the window's initial state (chunk j's
        # slice); later segments start from the carry handed up the ring
        h0_j = jax.lax.dynamic_slice_in_dim(h0, j * bs, bs, 1)
        c0_j = jax.lax.dynamic_slice_in_dim(c0, j * bs, bs, 1)
        h_in = jnp.where(sidx == 0, h0_j.astype(buf_h.dtype), buf_h)
        c_in = jnp.where(sidx == 0, c0_j.astype(buf_c.dtype), buf_c)

        if tp_axis is not None:
            h_top, (hT, cT) = tp_mod.tp_stack_forward(
                params, my_ids, h_in, c_in, cfg, tp_axis, tp_backend,
                dropout_key=seg_key,
            )

            def head(hrows):
                flat = hrows.reshape(-1, cfg.hidden)
                y = tp_mod.tp_head_logits(params, flat, cfg, tp_axis)
                return y.reshape(*hrows.shape[:-1], cfg.vocab)
        else:
            h_top, (hT, cT) = model.forward(
                params, my_ids, h_in, c_in, cfg, cell_fn=cell_fn,
                dropout_key=seg_key,
            )

            def head(hrows):
                return model.logits_from_h(params, hrows, cfg)

        if cfg.loss_mode == "last":
            # only global t = S-1 scores: final row of the final segment
            logits = head(h_top[-1])
            chunk_bits = jnp.sum(model.softmax_xent_bits(logits, my_tgt[-1]))
            scored = active & (sidx == d - 1)
        else:
            logits = head(h_top)
            chunk_bits = jnp.sum(model.softmax_xent_bits(logits, my_tgt))
            scored = active
        bits_acc = bits_acc + jnp.where(scored, chunk_bits, 0.0).astype(
            bits_acc.dtype
        )

        # the final segment's device assembles the window-final (h, c) for
        # the trainer's stream carry
        upd = active & (sidx == d - 1)
        hT_new = jax.lax.dynamic_update_slice_in_dim(
            hT_acc, hT.astype(hT_acc.dtype), j * bs, 1
        )
        cT_new = jax.lax.dynamic_update_slice_in_dim(
            cT_acc, cT.astype(cT_acc.dtype), j * bs, 1
        )
        hT_acc = jnp.where(upd, hT_new, hT_acc)
        cT_acc = jnp.where(upd, cT_new, cT_acc)

        out_h = hT.astype(cfg.pdtype)
        out_c = cT.astype(cfg.pdtype)
        if d > 1:
            out_h = jax.lax.ppermute(out_h, axis, perm)
            out_c = jax.lax.ppermute(out_c, axis, perm)
        return (out_h, out_c, bits_acc, hT_acc, cT_acc), None

    # the scan carries must be varying over every axis the inputs vary on
    # (the seq axis always; plus e.g. the data axis under the 2-D dp x sp
    # mesh where ids/h0 are batch-sharded, or the model axis under tp x sp
    # where the recurrent state is gate-sharded)
    def _vma_of(*vs):
        axes = {axis}
        for v in vs:
            axes |= getattr(jax.typeof(v), "vma", frozenset()) or frozenset()
        return tuple(sorted(axes))

    vma_axes = _vma_of(ids, targets, h0, c0)
    # the bit accumulator must NOT carry the model axis: under TP the head's
    # psum makes chunk_bits model-invariant, and the final seq psum must
    # yield a fully invariant loss
    bits_vma = _vma_of(ids, targets)
    buf0 = _varying(jnp.zeros((nl, bs, n), cfg.pdtype), vma_axes)
    bits0 = _varying(jnp.zeros((), cfg.adtype), bits_vma)
    acc0 = _varying(jnp.zeros((nl, b_, n), cfg.pdtype), vma_axes)
    (_, _, bits_acc, hT_acc, cT_acc), _ = jax.lax.scan(
        tick,
        (buf0, buf0, bits0, acc0, acc0),
        jnp.arange(n_chunks + d - 1),
    )
    total = jax.lax.psum(bits_acc, axis)
    denom = b_ if cfg.loss_mode == "last" else s * b_
    mean_bits = total / denom
    loss = mean_bits if cfg.loss_base == "2" else mean_bits * model.LN2
    # broadcast the assembled final state from the last device
    is_last = (sidx == d - 1).astype(hT_acc.dtype)
    hT = jax.lax.psum(hT_acc * is_last, axis)
    cT = jax.lax.psum(cT_acc * is_last, axis)
    return loss, (hT, cT, mean_bits)


def make_sp_loss_and_grad(
    mcfg: ModelConfig, mesh: Mesh, n_chunks: int, axis: str = "seq",
    cell_fn=None,
):
    """jitted ((loss, bits), grads) over the seq mesh — everything
    replicated; grads come back reduced by the vma transpose."""
    repl = jax.tree_util.tree_map(
        lambda _: P(), jax.eval_shape(lambda: model.init_params(mcfg))
    )

    def local(params, ids, targets, h0, c0):
        def loss_of(p):
            loss, (hT, cT, bits) = sp_loss_fn(
                p, ids, targets, h0, c0, mcfg, n_chunks, axis, cell_fn
            )
            return loss, (hT, cT, bits)

        # differentiate wrt an explicitly device-varying copy of the
        # replicated params (the embed op's custom VJP requires matching
        # vma types); each device's grads are its pipeline contribution,
        # psum'd to the total
        params_v = jax.tree_util.tree_map(lambda x: _varying(x, axis), params)
        (loss, (hT, cT, bits)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(params_v)
        grads = jax.lax.psum(grads, axis)
        return loss, bits, hT, cT, grads

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(repl, P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), repl),
    )
    return jax.jit(mapped)


def _streamed_window_fn(state, win):
    w = win.astype(jnp.int32)
    return w[:-1], w[1:]


def make_sp_superstep(
    mcfg: ModelConfig,
    dcfg: DataConfig,
    tcfg: TrainConfig,
    corpus,
    mesh: Mesh,
    axis: str = "seq",
    cell_fn=None,
    donate: bool = True,
    length: int = None,
    streamed: bool = False,
):
    """Full jitted K-step training superstep over the seq mesh: window
    gather → time-pipelined fwd/bwd → Adagrad → cursor advance → stream
    carry, mirroring trainer.make_superstep step-for-step (tests/test_sp.py
    gates training-trajectory parity with the single-device path, including
    stream resets).

    ``streamed=True`` builds ``superstep(state, windows)`` fed by the host
    feeder's (K, S+1, B) uint8 batch (replicated — each device slices its
    own time segment in-jit); pass ``length`` instead of ``corpus``."""
    from ..data import corpus as corpus_mod
    from ..train.trainer import TrainState, _make_inner, _scan_metrics

    ndev = mesh.devices.size
    length = int(corpus.shape[0]) if corpus is not None else int(length)
    seq = dcfg.seq
    n_chunks = tcfg.pp_chunks
    if seq % ndev != 0:
        raise ValueError(f"seq {seq} not divisible by {ndev} seq devices")
    if dcfg.batch % n_chunks != 0:
        raise ValueError(
            f"batch {dcfg.batch} not divisible by pp_chunks {n_chunks}"
        )

    if streamed:
        window_fn = _streamed_window_fn
    else:
        def window_fn(state, _):
            return corpus_mod.make_windows(corpus, state.positions, seq)

    def loss_grad_fn(params, x, t, h, c, dropout_key=None):
        def loss_of(p):
            return sp_loss_fn(
                p, x, t, h, c, mcfg, n_chunks, axis, cell_fn,
                dropout_key=dropout_key,
            )

        # differentiate wrt an explicitly device-varying copy of the
        # replicated params; each device's grads are its pipeline-segment
        # contribution, one psum totals them
        params_v = jax.tree_util.tree_map(lambda p: _varying(p, axis), params)
        (loss, (h2, c2, bits)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(params_v)
        grads = jax.lax.psum(grads, axis)
        return (loss, ((h2, c2), bits)), grads

    # the guard / cursor / reset / Adagrad block is the trainer's own
    # builder, so SP stays trajectory-identical by construction (state is
    # replicated — even the reset RNG stream matches the single-device path)
    inner = _make_inner(
        mcfg, dcfg, tcfg, length, cell_fn, window_fn, loss_grad_fn
    )

    def local_superstep(state: TrainState, *xs):
        state, (bits, gnorms) = jax.lax.scan(
            inner, state, xs[0] if xs else None,
            length=None if xs else tcfg.superstep,
        )
        return state, _scan_metrics(bits, gnorms)

    repl = jax.tree_util.tree_map(
        lambda _: P(),
        jax.eval_shape(lambda: model.init_params(mcfg)),
    )
    state_specs = TrainState(
        params=repl, m=repl, h=P(), c=P(), positions=P(), step=P(), key=P()
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


def shard_sp_state(state, mesh: Mesh, axis: str = "seq"):
    """Everything replicated — SP shards wall-clock time, not arrays."""
    from ..train.trainer import TrainState

    repl = NamedSharding(mesh, P())
    put = lambda x: jax.device_put(x, repl)
    return TrainState(
        params=jax.tree_util.tree_map(put, state.params),
        m=jax.tree_util.tree_map(put, state.m),
        h=put(state.h),
        c=put(state.c),
        positions=put(state.positions),
        step=put(state.step),
        key=put(state.key),
    )


def make_dp_sp_superstep(
    mcfg: ModelConfig,
    dcfg: DataConfig,
    tcfg: TrainConfig,
    corpus,
    mesh: Mesh,
    data_axis: str = "data",
    seq_axis: str = "seq",
    cell_fn=None,
    donate: bool = True,
    length: int = None,
    streamed: bool = False,
):
    """2-D (data x seq) composition: the global batch is sharded over the
    data axis (each shard owns its stream cursors and recurrent state) and
    each data shard pipelines its BPTT window over the seq axis exactly as
    the 1-D SP path does. Params stay replicated everywhere; gradients are
    the seq-axis psum of pipeline-segment contributions, pmean'd over data
    (the DP average). Mirrors make_dp_tp_superstep's structure; exactness vs
    the single-device trainer is gated by tests/test_sp.py."""
    from ..data import corpus as corpus_mod
    from ..train.trainer import TrainState, _make_inner, _scan_metrics

    n_data = mesh.shape[data_axis]
    n_seq = mesh.shape[seq_axis]
    length = int(corpus.shape[0]) if corpus is not None else int(length)
    seq = dcfg.seq
    n_chunks = tcfg.pp_chunks
    if dcfg.batch % n_data != 0:
        raise ValueError(f"batch {dcfg.batch} not divisible by {n_data} data shards")
    local_b = dcfg.batch // n_data
    if seq % n_seq != 0:
        raise ValueError(f"seq {seq} not divisible by {n_seq} seq devices")
    if local_b % n_chunks != 0:
        raise ValueError(
            f"per-shard batch {local_b} not divisible by pp_chunks {n_chunks}"
        )

    if streamed:
        window_fn = _streamed_window_fn
    else:
        def window_fn(state, _):
            return corpus_mod.make_windows(corpus, state.positions, seq)

    def loss_grad_fn(params, x, t, h, c, dropout_key=None):
        # decorrelate the mask stream per data shard (each trains its own
        # batch slice — the DP convention, parallel/dp.py)
        if dropout_key is not None:
            dropout_key = jax.random.fold_in(
                dropout_key, jax.lax.axis_index(data_axis)
            )

        def loss_of(p):
            return sp_loss_fn(
                p, x, t, h, c, mcfg, n_chunks, seq_axis, cell_fn,
                dropout_key=dropout_key,
            )

        # params enter varying on BOTH axes: their cotangents pick up the
        # data axis from the batch-sharded inputs, and the seq axis from the
        # pipeline segments
        params_v = jax.tree_util.tree_map(
            lambda p: _varying(p, (data_axis, seq_axis)), params
        )
        (loss, (h2, c2, bits)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(params_v)
        # seq-axis psum totals the pipeline segments; data-axis pmean is the
        # DP average over batch shards (cursors/state stay shard-local)
        grads = jax.lax.pmean(jax.lax.psum(grads, seq_axis), data_axis)
        bits = jax.lax.pmean(bits, data_axis)
        loss = jax.lax.pmean(loss, data_axis)
        return (loss, ((h2, c2), bits)), grads

    inner = _make_inner(
        mcfg, dcfg, tcfg, length, cell_fn, window_fn, loss_grad_fn,
        reset_fold_axes=(data_axis,),
    )

    def local_superstep(state: TrainState, *xs):
        state, (bits, gnorms) = jax.lax.scan(
            inner, state, xs[0] if xs else None,
            length=None if xs else tcfg.superstep,
        )
        return state, _scan_metrics(bits, gnorms)

    repl = jax.tree_util.tree_map(
        lambda _: P(), jax.eval_shape(lambda: model.init_params(mcfg))
    )
    state_specs = TrainState(
        params=repl, m=repl,
        h=P(None, data_axis, None), c=P(None, data_axis, None),
        positions=P(data_axis), step=P(), key=P(),
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


def make_mesh_dp_sp(n_data: int, n_seq: int, devices=None) -> Mesh:
    from .dp_tp import make_mesh_2d

    return make_mesh_2d(n_data, n_seq, devices, ("data", "seq"))


def make_tp_sp_superstep(
    mcfg: ModelConfig,
    dcfg: DataConfig,
    tcfg: TrainConfig,
    corpus,
    mesh: Mesh,
    seq_axis: str = "seq",
    model_axis: str = "model",
    backend: str = "xla",
    cell_fn=None,
    donate: bool = True,
    length: int = None,
    streamed: bool = False,
):
    """2-D (seq x model) composition: each time segment of the BPTT window
    runs the gate-sharded TP forward over the model axis (weights, Adagrad
    state and recurrent state all sharded N/Dm — parallel/tp.py's layout),
    while the window pipelines over the seq axis exactly as 1-D SP does.
    The seq-ring ppermute moves model-axis *shards*, so ICI carry traffic
    shrinks Dm-fold vs unsharded SP. Gradients: per-segment contributions
    psum over seq; model-axis grads are shard-local (no collective), exactly
    as in make_tp_superstep. Exactness vs the single-device trainer is gated
    by tests/test_sp.py."""
    from ..data import corpus as corpus_mod
    from ..train.trainer import TrainState, _make_inner, _scan_metrics
    from . import tp as tp_mod

    n_seq = mesh.shape[seq_axis]
    n_model = mesh.shape[model_axis]
    length = int(corpus.shape[0]) if corpus is not None else int(length)
    seq = dcfg.seq
    n_chunks = tcfg.pp_chunks
    if seq % n_seq != 0:
        raise ValueError(f"seq {seq} not divisible by {n_seq} seq devices")
    if dcfg.batch % n_chunks != 0:
        raise ValueError(
            f"batch {dcfg.batch} not divisible by pp_chunks {n_chunks}"
        )
    if mcfg.hidden % n_model != 0:
        raise ValueError(
            f"hidden {mcfg.hidden} not divisible by {n_model} model devices"
        )

    if streamed:
        window_fn = _streamed_window_fn
    else:
        def window_fn(state, _):
            return corpus_mod.make_windows(corpus, state.positions, seq)

    def loss_grad_fn(params, x, t, h, c, dropout_key=None):
        # dropout_key stays model-axis-invariant: the mask applies to the
        # all-gathered full hidden sequence (tp.tp_stack_forward)

        def loss_of(p):
            return sp_loss_fn(
                p, x, t, h, c, mcfg, n_chunks, seq_axis, cell_fn,
                tp_axis=model_axis, tp_backend=backend,
                dropout_key=dropout_key,
            )

        # params are model-sharded (varying over model) but seq-invariant;
        # differentiate wrt a seq-varying copy so each seq device's grads
        # are its pipeline-segment contribution, psum'd to the total
        params_v = jax.tree_util.tree_map(
            lambda p: _varying(p, seq_axis), params
        )
        (loss, (h2, c2, bits)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(params_v)
        grads = jax.lax.psum(grads, seq_axis)
        return (loss, ((h2, c2), bits)), grads

    inner = _make_inner(
        mcfg, dcfg, tcfg, length, cell_fn, window_fn, loss_grad_fn,
        reset_fold_axes=(model_axis,),
        opt_kwargs=dict(
            psum_axis=model_axis,
            replicated=tp_mod.tp_replicated_mask(mcfg, model_axis),
        ),
    )

    def local_superstep(state: TrainState, *xs):
        state, (bits, gnorms) = jax.lax.scan(
            inner, state, xs[0] if xs else None,
            length=None if xs else tcfg.superstep,
        )
        return state, _scan_metrics(bits, gnorms)

    pspecs = tp_mod.tp_specs(mcfg, model_axis)
    state_specs = TrainState(
        params=pspecs, m=pspecs,
        h=P(None, None, model_axis), c=P(None, None, model_axis),
        positions=P(), step=P(), key=P(),
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


def make_mesh_tp_sp(n_seq: int, n_model: int, devices=None) -> Mesh:
    from .dp_tp import make_mesh_2d

    return make_mesh_2d(n_seq, n_model, devices, ("seq", "model"))


def shard_tp_sp_state(state, mesh: Mesh, mcfg: ModelConfig,
                      model_axis: str = "model"):
    """Place a single-device TrainState (params already TP-permuted for
    mesh.shape['model'] devices) onto the (seq x model) mesh — the TP
    shardings, replicated over seq."""
    from ..train.trainer import TrainState

    from . import tp as tp_mod

    pspecs = tp_mod.tp_specs(mcfg, model_axis)
    put = lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp))
    return TrainState(
        params=jax.tree_util.tree_map(put, state.params, pspecs),
        m=jax.tree_util.tree_map(put, state.m, pspecs),
        h=put(state.h, P(None, None, model_axis)),
        c=put(state.c, P(None, None, model_axis)),
        positions=put(state.positions, P()),
        step=put(state.step, P()),
        key=put(state.key, P()),
    )


def shard_dp_sp_state(state, mesh: Mesh, data_axis: str = "data"):
    """Params/m replicated; stream state and cursors sharded over data."""
    from ..train.trainer import TrainState

    repl = NamedSharding(mesh, P())
    put = lambda x, sp=P(): jax.device_put(x, NamedSharding(mesh, sp))
    return TrainState(
        params=jax.tree_util.tree_map(lambda x: put(x), state.params),
        m=jax.tree_util.tree_map(lambda x: put(x), state.m),
        h=put(state.h, P(None, data_axis, None)),
        c=put(state.c, P(None, data_axis, None)),
        positions=put(state.positions, P(data_axis)),
        step=put(state.step),
        key=put(state.key),
    )
