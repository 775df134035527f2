"""Tensor-parallel (gate-sharded) LSTM over a ``model`` mesh axis.

Motivation (docs/PERFORMANCE.md roofline): at N=2048 a single chip must
re-stream the 32 MB recurrent weight U from HBM every timestep — the
recurrence is HBM-bound (~28% MFU ceiling) no matter how the kernel is
written. Sharding the 4N gate axis across D chips shrinks each chip's U
shard to (N, 4N/D), which fits VMEM again; the only added communication is
an all-gather of h (B, N — hundreds of KB) per step over ICI.

Layout. Plain column-chunking of the packed ``[i|o|f|u]`` axis would give
device 0 *all* of gate i, which breaks the elementwise cell update. Instead
the 4N axis is permuted to device-major groups ``[i_d o_d f_d u_d]`` (each
N/D wide), so device d holds the i/o/f/u slices of *its own* N/D hidden
units and computes its c_d, h_d shard entirely locally:

    h_full = all_gather(h_d)                  # (B, N)   — ICI, per step
    g_d    = xw_d + h_full @ U_d              # (B, 4N/D) — MXU
    c_d, h_d = cell(g_d, c_d)                 # local elementwise
    logits = psum_d(h_d @ Why_d) + by         # head: row-sharded Why

Backward is ``jax.grad`` through the collectives (all_gather ⇄
reduce_scatter transposes are automatic). Composes with data parallelism on
a 2-D (data, model) mesh. The reference has no model parallelism of any
kind (SURVEY.md §2.4) — this is TPU-native new capability.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..models import lstm as model
from ..ops import cell as cell_ops


def _pvary_if_invariant(x, axis: str):
    """Mark ``x`` varying over ``axis`` unless its vma type already is —
    the reset noise is device-varying by value (the key folds in
    ``axis_index``), but depending on what else fed the key (e.g. streamed
    windows) the tracer may or may not carry the axis in its vma set."""
    vma = getattr(jax.typeof(x), "vma", frozenset()) or frozenset()
    if axis in vma:
        return x
    # prefer the new name (pcast); pvary is deprecated and will disappear
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (axis,), to="varying")
    if hasattr(jax.lax, "pvary"):
        return jax.lax.pvary(x, (axis,))
    return x


def _gate_permutation(n: int, ndev: int) -> np.ndarray:
    """Permutation of the packed 4N gate axis from gate-major ``[i|o|f|u]``
    (each N) to device-major ``[[i_d o_d f_d u_d] for d]`` (each 4*N/ndev)."""
    nd = n // ndev
    cols = []
    for d in range(ndev):
        for gate in range(4):
            start = gate * n + d * nd
            cols.append(np.arange(start, start + nd))
    return np.concatenate(cols)


def permute_params_for_tp(params: model.LSTMParams, ndev: int) -> model.LSTMParams:
    """Reorder weight columns (and Why rows) into the TP device-major layout.
    The result still computes the identical function when used with
    ``tp_forward`` on an ndev-way model axis."""
    layers = []
    for layer in params.layers:
        n = layer.U.shape[0]
        if n % ndev != 0:
            raise ValueError(f"hidden {n} not divisible by {ndev} TP devices")
        perm = _gate_permutation(n, ndev)
        layers.append(
            model.LayerParams(
                W=layer.W[:, perm],
                U=layer.U[:, perm],
                b=layer.b[perm],
            )
        )
    # Why rows follow the hidden units: device d owns rows [d*N/D, (d+1)*N/D)
    # — plain chunking already matches, no permutation needed.
    return model.LSTMParams(tuple(layers), params.Why, params.by)


def tp_specs(mcfg: ModelConfig, axis: str = "model"):
    """PartitionSpecs for the permuted params on the model axis."""
    layer_spec = model.LayerParams(W=P(None, axis), U=P(None, axis), b=P(axis))
    return model.LSTMParams(
        layers=tuple(layer_spec for _ in range(mcfg.num_layers)),
        Why=P(axis, None),
        by=P(),
    )


def tp_replicated_mask(mcfg: ModelConfig, axis: str = "model"):
    """Bool pytree marking params replicated across the model axis (spec P()
    — currently only ``by``); their grad-norm contribution must not be
    multiplied by the axis size in the optimizer's psum (optimizer.global_norm)."""
    return jax.tree_util.tree_map(
        lambda spec: all(e is None for e in spec), tp_specs(mcfg, axis)
    )


def _tp_scan_layer(layer, xw, h0_d, c0_d, cfg: ModelConfig, axis: str,
                   backend: str = "xla"):
    """Shard-local recurrence: xw (S, B, 4N/D), h0_d/c0_d (B, N/D).
    Uses shard-local gate order [i,o,f,u] each N/D wide.

    ``backend="pallas"`` fuses the shard-local gate matmul + cell into one
    kernel per step (ops/pallas_tp_cell.py). ``backend="pallas_seq"`` runs
    the WHOLE recurrence in one kernel with the U shard VMEM-resident and
    the per-step h exchange done in-kernel over ICI remote DMAs
    (ops/pallas_tp_seq.py) — the fastest TP structure."""
    nd = layer.U.shape[1] // 4
    # the scan carries h/c in param dtype; the stream state arrives as f32
    h0_d = h0_d.astype(cfg.pdtype)
    c0_d = c0_d.astype(cfg.pdtype)
    if backend == "pallas_seq":
        from ..ops.pallas_tp_seq import tp_seq_lstm

        ndev = jax.lax.axis_size(axis)
        return tp_seq_lstm(layer.U, xw, h0_d, c0_d, cfg, axis, ndev)
    if backend == "pallas":
        from ..ops.pallas_tp_cell import fused_tp_step

        def step(carry, xw_t):
            h_d, c_d = carry
            h_full = jax.lax.all_gather(h_d, axis, axis=1, tiled=True)
            h2, c2 = fused_tp_step(layer.U, xw_t, h_full, c_d, cfg, axis)
            return (h2.astype(cfg.pdtype), c2.astype(cfg.pdtype)), h2.astype(cfg.pdtype)

        (hT, cT), h_seq = jax.lax.scan(step, (h0_d, c0_d), xw)
        return h_seq, (hT, cT)

    def step(carry, xw_t):
        h_d, c_d = carry
        h_full = jax.lax.all_gather(h_d, axis, axis=1, tiled=True)  # (B, N)
        g_pre = xw_t + cell_ops.matmul(h_full, layer.U, cfg.cdtype)
        h_d, c_d = cell_ops.cell_step(
            g_pre, c_d.astype(cfg.adtype), nd, cfg.cell_variant
        )
        h_d = h_d.astype(cfg.pdtype)
        c_d = c_d.astype(cfg.pdtype)
        return (h_d, c_d), h_d

    (hT, cT), h_seq = jax.lax.scan(step, (h0_d, c0_d), xw)
    return h_seq, (hT, cT)


def tp_stack_forward(
    params: model.LSTMParams,   # shard-local leaves (inside shard_map)
    ids: jax.Array,             # (S, B) — replicated over the model axis
    h0: jax.Array,              # (L, B, N/D) shard
    c0: jax.Array,
    cfg: ModelConfig,
    axis: str = "model",
    backend: str = "xla",
    dropout_key=None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Gate-sharded forward over the whole layer stack: returns the
    all-gathered top hidden sequence (S, B, N) and the stacked shard-local
    final state (L, B, N/D). The layer loop of ``tp_loss_fn``, factored out
    so time-segment callers (TP x SP, parallel/sp.py) can pipeline it.

    ``dropout_key``: train-mode inter-layer + pre-head dropout (see
    models.lstm.forward). The mask is applied to the *all-gathered* full
    hidden sequence, and the key must be model-axis-invariant: every shard
    then draws the identical mask over the identical (S, B, N) shape, so the
    masked activations stay replicated across the model axis (this also makes
    the mask stream bit-identical to the single-device XLA `_dropout` path
    given the same key — gated by tests/test_compositions.py)."""
    s, b_ = ids.shape
    drop = cfg.dropout if dropout_key is not None else 0.0
    x_full = None  # full hidden sequence of the layer below (all-gathered)
    h_last, c_last = [], []
    for l, layer in enumerate(params.layers):
        if l == 0:
            W0 = layer.W
            if cfg.tie_embeddings:
                # tied embeddings under TP: Why rows are plain-chunked over
                # the model axis, so an all_gather restores the (N, M) head;
                # its transpose (the shared embedding) pushed through the
                # gate-sharded projection gives the local effective (M, 4N/D)
                # embed weight (models.lstm._substitute_tied_embed, sharded).
                # The gather's transpose reduce-scatters dWhy correctly.
                why_full = jax.lax.all_gather(
                    params.Why, axis, axis=0, tiled=True
                )
                W0 = cell_ops.matmul(
                    why_full.T, W0, cfg.cdtype, cfg.adtype
                ).astype(W0.dtype)
            # W_d is column-sharded: the gather yields the local xw shard
            xw = W0[ids].astype(cfg.adtype) + layer.b.astype(cfg.adtype)
        else:
            flat = x_full.reshape(s * b_, -1)
            xw = cell_ops.matmul(flat, layer.W, cfg.cdtype).reshape(s, b_, -1)
            xw = xw + layer.b.astype(cfg.adtype)
        h_seq_d, (hT, cT) = _tp_scan_layer(
            layer, xw, h0[l], c0[l], cfg, axis, backend
        )
        x_full = jax.lax.all_gather(h_seq_d, axis, axis=2, tiled=True)
        if drop > 0.0:
            x_full = model._dropout(
                x_full, drop, jax.random.fold_in(dropout_key, l)
            )
        h_last.append(hT)
        c_last.append(cT)
    return x_full, (jnp.stack(h_last), jnp.stack(c_last))


def tp_head_logits(
    params: model.LSTMParams,
    flat: jax.Array,            # (T, N) full hidden rows
    cfg: ModelConfig,
    axis: str = "model",
) -> jax.Array:
    """Row-sharded softmax head: each device contracts its N/D rows of Why
    against its slice of the hidden features; partial products psum over the
    model axis (one (T, M) collective)."""
    nd = params.Why.shape[0]
    d_idx = jax.lax.axis_index(axis)
    local = jax.lax.dynamic_slice_in_dim(flat, d_idx * nd, nd, axis=1)
    y = cell_ops.matmul(local, params.Why, cfg.cdtype)
    return jax.lax.psum(y, axis) + params.by.astype(cfg.adtype)


def tp_loss_fn(
    params: model.LSTMParams,   # shard-local leaves (inside shard_map)
    ids: jax.Array,             # (S, B) — replicated
    targets: jax.Array,         # (S, B) — replicated
    h0: jax.Array,              # (L, B, N/D) shard
    c0: jax.Array,              # (L, B, N/D) shard
    cfg: ModelConfig,
    axis: str = "model",
    backend: str = "xla",
    dropout_key=None,
) -> Tuple[jax.Array, Tuple[Tuple[jax.Array, jax.Array], jax.Array]]:
    """Shard-local mirror of ``models.lstm.loss_fn`` under TP. Loss and
    metrics come out replicated across the model axis. ``backend="pallas"``
    fuses each step's gate matmul + cell (ops/pallas_tp_cell.py).
    ``dropout_key`` (model-axis-invariant): train-mode dropout, see
    ``tp_stack_forward``."""
    s, b_ = ids.shape
    x_full, (hT, cT) = tp_stack_forward(
        params, ids, h0, c0, cfg, axis, backend, dropout_key=dropout_key
    )
    logits = tp_head_logits(
        params, x_full.reshape(s * b_, -1), cfg, axis
    ).reshape(s, b_, cfg.vocab)

    if cfg.loss_mode == "last":
        bits = model.softmax_xent_bits(logits[-1], targets[-1])
    else:
        bits = model.softmax_xent_bits(logits, targets)
    mean_bits = jnp.mean(bits)
    loss = mean_bits if cfg.loss_base == "2" else mean_bits * model.LN2
    return loss, ((hT, cT), mean_bits)


def make_tp_loss_and_grad(mcfg: ModelConfig, mesh: Mesh, axis: str = "model",
                          backend: str = "xla", check_vma: bool = True):
    """jitted (loss, bits), grads over the TP mesh. Params must be permuted
    (``permute_params_for_tp``) and placed with ``shard_tp_params``.
    ``check_vma=False`` is required to run the pallas_seq backend in
    interpret mode (the interpreter's internal buffers carry no vma types)."""
    pspecs = tp_specs(mcfg, axis)
    state_spec = P(None, None, axis)   # (L, B, N) sharded on hidden

    def local(params, ids, targets, h0, c0):
        def loss_of(p):
            return tp_loss_fn(p, ids, targets, h0, c0, mcfg, axis, backend)

        (loss, (_, bits)), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        return loss, bits, grads

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(pspecs, P(), P(), state_spec, state_spec),
        out_specs=(P(), P(), pspecs),
        check_vma=check_vma,
    )
    return jax.jit(mapped)


def shard_tp_params(params: model.LSTMParams, mesh: Mesh, axis: str = "model"):
    """Place permuted params with the TP shardings."""
    specs = tp_specs(ModelConfig(hidden=params.layers[0].U.shape[0],
                                 num_layers=len(params.layers)), axis)
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), params, specs
    )


def make_tp_superstep(
    mcfg: ModelConfig,
    dcfg,
    tcfg,
    corpus,
    mesh: Mesh,
    axis: str = "model",
    donate: bool = True,
    backend: str = "xla",
    check_vma: bool = True,
    length: int = None,
    streamed: bool = False,
):
    """Full TP training superstep (scan of K steps): windows are replicated
    (every device reads the same byte streams), each device trains its own
    weight shards — no gradient collective at all; the only per-step
    communication is the all-gather of h inside the recurrence and the head
    psum. State layout mirrors ``trainer.TrainState`` with params/m in the
    permuted TP sharding and h/c sharded on the hidden axis.

    ``streamed=True`` builds ``superstep(state, windows)`` fed by the host
    feeder's (K, S+1, B) uint8 batch (replicated over the mesh — every
    device reads the full batch under TP); pass ``length`` (corpus bytes)
    instead of ``corpus``. Cursors advance in-jit exactly as the resident
    path, so the two are trajectory-identical (tests/test_streaming.py)."""
    from ..data import corpus as corpus_mod
    from ..train import optimizer as opt_mod
    from ..train.trainer import TrainState

    length = int(corpus.shape[0]) if corpus is not None else int(length)
    stride = dcfg.effective_stride
    seq = dcfg.seq
    ndev = mesh.devices.size

    if streamed:
        def window_fn(state, win):
            w = win.astype(jnp.int32)
            return w[:-1], w[1:]
    else:
        def window_fn(state, _):
            return corpus_mod.make_windows(corpus, state.positions, seq)

    def inner(state: TrainState, xs):
        x, t = window_fn(state, xs)
        # per-step dropout key (model-axis-invariant: every shard must draw
        # the identical mask over the replicated full hidden sequence)
        dkey = (
            jax.random.fold_in(state.key, state.step)
            if mcfg.dropout > 0.0 else None
        )

        def loss_of(p):
            return tp_loss_fn(
                p, x, t, state.h, state.c, mcfg, axis, backend,
                dropout_key=dkey,
            )

        (loss, ((h2, c2), bits)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state.params)
        if tcfg.skip_nonfinite:
            finite = jnp.isfinite(loss)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
            )
            # keep the pre-step recurrent state so one bad step can't poison
            # every stream's hidden state until it wraps (see trainer.py)
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
            replicated=tp_replicated_mask(mcfg, axis),
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

    pspecs = tp_specs(mcfg, axis)
    state_specs = TrainState(
        params=pspecs,
        m=pspecs,
        h=P(None, None, axis),
        c=P(None, None, axis),
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
        check_vma=check_vma,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def shard_tp_state(state, mesh: Mesh, mcfg: ModelConfig, axis: str = "model"):
    """Place a single-device TrainState (params already permuted) onto the TP
    mesh."""
    from ..train.trainer import TrainState

    pspecs = tp_specs(mcfg, axis)
    put = lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp))
    return TrainState(
        params=jax.tree_util.tree_map(put, state.params, pspecs),
        m=jax.tree_util.tree_map(put, state.m, pspecs),
        h=put(state.h, P(None, None, axis)),
        c=put(state.c, P(None, None, axis)),
        positions=put(state.positions, P()),
        step=put(state.step, P()),
        key=put(state.key, P()),
    )


def unpermute_params_from_tp(params: model.LSTMParams, ndev: int) -> model.LSTMParams:
    """Inverse of ``permute_params_for_tp`` — back to canonical [i|o|f|u]
    layout (for checkpoints, eval, sampling)."""
    layers = []
    for layer in params.layers:
        n = layer.U.shape[0]
        perm = _gate_permutation(n, ndev)
        inv = np.argsort(perm)
        layers.append(
            model.LayerParams(W=layer.W[:, inv], U=layer.U[:, inv], b=layer.b[inv])
        )
    return model.LSTMParams(tuple(layers), params.Why, params.by)
