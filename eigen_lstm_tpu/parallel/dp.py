"""Data-parallel training over an ICI mesh: ``shard_map`` + ``psum``.

New capability mandated by BASELINE.json config 5 (the reference has no
distributed code to mirror — SURVEY.md §2.4): the global batch of B streams
is sharded across the mesh's ``data`` axis; each device runs the full
forward/BPTT on its local B/ndev streams against replicated parameters, and
gradients are all-reduced with one ``psum`` per step over ICI before an
identical Adagrad update on every device (keeping params replicated by
construction).

Per-device stream cursors: positions are sharded with the batch, so each
device gathers its own windows from its (replicated, read-only) corpus copy —
no host involvement, no cross-device data exchange beyond the grad psum.
"""

from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DataConfig, ModelConfig, TrainConfig
from ..data import corpus as corpus_mod
from ..models import lstm as model
from ..train import optimizer as opt_mod
from ..train.trainer import TrainState


def _make_dp_superstep_impl(
    mcfg: ModelConfig,
    dcfg: DataConfig,
    tcfg: TrainConfig,
    length: int,
    mesh: Mesh,
    axis: str,
    cell_fn,
    donate: bool,
    window_fn,
    streamed: bool,
):
    """Shared builder: ``window_fn(state, xs) -> (x, t)`` supplies each local
    shard's windows — gathered in-jit from a replicated corpus, or taken from
    a host-streamed batch sharded over the batch axis (data/streaming.py)."""
    ndev = mesh.devices.size
    if dcfg.batch % ndev != 0:
        raise ValueError(f"global batch {dcfg.batch} not divisible by {ndev} devices")
    stride = dcfg.effective_stride
    seq = dcfg.seq

    def inner(state: TrainState, xs):
        # identical math to trainer.make_superstep's inner, on local streams,
        # plus one grad psum — the only ICI communication per step
        x, t = window_fn(state, xs)
        # per-step dropout masks (decorrelated per shard: the local key is
        # already a per-device fold of the replicated key)
        dkey = (
            jax.random.fold_in(state.key, state.step)
            if mcfg.dropout > 0.0 else None
        )
        (loss, ((h2, c2), bits)), grads = jax.value_and_grad(
            model.loss_fn, has_aux=True
        )(state.params, x, t, state.h, state.c, mcfg, cell_fn, dkey)
        if tcfg.skip_nonfinite:
            finite = jnp.isfinite(loss)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
            )
            # keep the pre-step recurrent state so one bad step can't poison
            # this shard's streams until they wrap (see trainer.py)
            h2 = jnp.where(finite, h2, state.h.astype(h2.dtype))
            c2 = jnp.where(finite, c2, state.c.astype(c2.dtype))
        grads = jax.lax.pmean(grads, axis)
        bits = jax.lax.pmean(bits, axis)
        newpos, wrapped = corpus_mod.advance_positions(state.positions, stride, length, seq)
        if dcfg.carry_state:
            key, sub = jax.random.split(state.key)
            mask = wrapped[None, :, None]
            if dcfg.reset_std > 0.0:
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
            state.params, grads, state.m, state.step, tcfg
        )
        return TrainState(params, m, h2, c2, newpos, state.step + 1, key), (bits, gnorm)

    def local_superstep(state: TrainState, *xs):
        # per-device RNG for stream resets: fold the device index into the
        # replicated key; the carried key stays replicated (advanced once)
        local_key = jax.random.fold_in(state.key, jax.lax.axis_index(axis))
        next_global_key = jax.random.split(state.key)[0]
        state = dataclasses.replace(state, key=local_key)
        state, (bits, gnorms) = jax.lax.scan(
            inner, state, xs[0] if xs else None, length=tcfg.superstep
        )
        state = dataclasses.replace(state, key=next_global_key)
        return state, {
            "bits_mean": jnp.mean(bits),
            "bits_last": bits[-1],
            "gnorm_mean": jnp.mean(gnorms),
            "gnorm_max": jnp.max(gnorms),
        }

    stream_spec = P(None, axis, None)   # (L, B, N) sharded over B
    state_specs = TrainState(
        params=jax.tree_util.tree_map(lambda _: P(), _params_struct(mcfg)),
        m=jax.tree_util.tree_map(lambda _: P(), _params_struct(mcfg)),
        h=stream_spec,
        c=stream_spec,
        positions=P(axis),
        step=P(),
        key=P(),
    )
    metrics_specs = {"bits_mean": P(), "bits_last": P(), "gnorm_mean": P(), "gnorm_max": P()}
    in_specs = (state_specs,)
    if streamed:
        in_specs = (state_specs, P(None, None, axis))   # (K, S+1, B) over B

    mapped = jax.shard_map(
        local_superstep,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(state_specs, metrics_specs),
        # NOTE: with check_vma=True, the grads of replicated params inside
        # value_and_grad get an implicit cross-device reduction that double
        # counts against the explicit pmean below (parity test catches it);
        # unchecked mode + explicit pmean is the configuration validated
        # against the single-device run (tests/test_parallel.py).
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def make_dp_superstep(
    mcfg: ModelConfig,
    dcfg: DataConfig,
    tcfg: TrainConfig,
    corpus: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    cell_fn=None,
    donate: bool = True,
):
    """Build the jitted data-parallel superstep over a device-resident
    (replicated) corpus.

    Expects a ``TrainState`` whose per-stream leaves (h, c, positions) are
    sharded over ``axis`` and whose params/m/step are replicated (see
    ``shard_state``). Global batch ``dcfg.batch`` must divide the mesh size.
    """

    def window_fn(state, _):
        return corpus_mod.make_windows(corpus, state.positions, dcfg.seq)

    return _make_dp_superstep_impl(
        mcfg, dcfg, tcfg, int(corpus.shape[0]), mesh, axis, cell_fn, donate,
        window_fn, streamed=False,
    )


def make_dp_streamed_superstep(
    mcfg: ModelConfig,
    dcfg: DataConfig,
    tcfg: TrainConfig,
    length: int,
    mesh: Mesh,
    axis: str = "data",
    cell_fn=None,
    donate: bool = True,
):
    """DP superstep fed by host-streamed windows: ``superstep(state,
    windows)`` with ``windows`` the feeder's global (K, S+1, B) uint8 batch,
    device_put sharded over the batch axis (per-host feeding — each device
    receives only its B/ndev stream slice). Cursors advance in-jit exactly
    as the resident path, so the two are trajectory-identical."""

    def window_fn(state, win):
        w = win.astype(jnp.int32)
        return w[:-1], w[1:]

    return _make_dp_superstep_impl(
        mcfg, dcfg, tcfg, length, mesh, axis, cell_fn, donate,
        window_fn, streamed=True,
    )


def _params_struct(mcfg: ModelConfig):
    """Abstract params pytree (shapes only) for building spec trees."""
    return jax.eval_shape(lambda: model.init_params(mcfg))


def shard_state(state: TrainState, mesh: Mesh, axis: str = "data") -> TrainState:
    """Place a host/single-device TrainState onto the mesh: params/m/step/key
    replicated, per-stream leaves sharded over the batch dim. Each device
    gets a distinct fold of the RNG key (stream resets must differ)."""
    repl = NamedSharding(mesh, P())
    stream = NamedSharding(mesh, P(None, axis, None))
    pos_sh = NamedSharding(mesh, P(axis))
    return TrainState(
        params=jax.device_put(state.params, repl),
        m=jax.device_put(state.m, repl),
        h=jax.device_put(state.h, stream),
        c=jax.device_put(state.c, stream),
        positions=jax.device_put(state.positions, pos_sh),
        step=jax.device_put(state.step, repl),
        key=jax.device_put(state.key, repl),
    )
