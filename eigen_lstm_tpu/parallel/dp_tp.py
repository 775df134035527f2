"""2-D parallel training: data x model mesh (DP batch sharding composed with
gate-sharded tensor parallelism).

Mesh ("data", "model") of shape (Dd, Dm):
* batch streams + cursors shard over "data" (each data-row trains its own
  windows, exactly parallel/dp.py);
* weights + hidden state shard over "model" (gate-sharded TP,
  parallel/tp.py);
* the objective is the *global* mean loss: ``pmean over "data"`` is applied
  inside the differentiated function, so JAX's collective transposes produce
  exactly the globally-averaged gradients (validated against the
  single-device run in tests/test_dp_tp.py). Per-step communication: h
  all-gather + head psum over "model" (ICI-minor) and one grad-sized pmean
  over "data".
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DataConfig, ModelConfig, TrainConfig
from ..data import corpus as corpus_mod
from ..train import optimizer as opt_mod
from ..train.trainer import TrainState
from . import tp as tp_mod


def make_mesh_2d(n_data: int, n_model: int, devices=None,
                 axis_names=("data", "model")) -> Mesh:
    import numpy as np

    devs = list(devices) if devices is not None else jax.devices()
    need = n_data * n_model
    if need > len(devs):
        raise ValueError(f"need {need} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:need]).reshape(n_data, n_model), axis_names)


def make_dp_tp_superstep(
    mcfg: ModelConfig,
    dcfg: DataConfig,
    tcfg: TrainConfig,
    corpus,
    mesh: Mesh,
    donate: bool = True,
    backend: str = "xla",
    check_vma: bool = True,
    length: int = None,
    streamed: bool = False,
):
    """Full training superstep over a ("data", "model") mesh. Expects a
    TrainState with TP-permuted params (see ``shard_dp_tp_state``).

    ``streamed=True`` builds ``superstep(state, windows)`` fed by the host
    feeder's (K, S+1, B) uint8 batch, sharded over "data" on the batch axis
    (each data-row reads its own stream slice; replicated over "model");
    pass ``length`` instead of ``corpus``."""
    n_data = mesh.shape["data"]
    if dcfg.batch % n_data != 0:
        raise ValueError(f"global batch {dcfg.batch} not divisible by {n_data}")
    length = int(corpus.shape[0]) if corpus is not None else int(length)
    stride = dcfg.effective_stride
    seq = dcfg.seq

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
        # own streams), invariant over "model" (the full hidden sequence is
        # replicated there — every model shard must draw the same mask)
        dkey = None
        if mcfg.dropout > 0.0:
            dkey = jax.random.fold_in(
                jax.random.fold_in(state.key, state.step),
                jax.lax.axis_index("data"),
            )

        def loss_of(p):
            loss, aux = tp_mod.tp_loss_fn(
                p, x, t, state.h, state.c, mcfg, "model", backend,
                dropout_key=dkey,
            )
            # the global objective: mean over every data shard — its
            # collective transpose yields globally-averaged gradients
            return jax.lax.pmean(loss, "data"), aux

        (loss, ((h2, c2), bits)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state.params)
        bits = jax.lax.pmean(bits, "data")
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
                sub = jax.random.fold_in(sub, jax.lax.axis_index("data"))
                sub = jax.random.fold_in(sub, jax.lax.axis_index("model"))
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
            state.params, grads, state.m, state.step, tcfg, psum_axis="model",
            replicated=tp_mod.tp_replicated_mask(mcfg, "model"),
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

    pspecs = tp_mod.tp_specs(mcfg, "model")
    state_specs = TrainState(
        params=pspecs,
        m=pspecs,
        h=P(None, "data", "model"),
        c=P(None, "data", "model"),
        positions=P("data"),
        step=P(),
        key=P(),
    )
    metrics_specs = {"bits_mean": P(), "bits_last": P(), "gnorm_mean": P(), "gnorm_max": P()}
    in_specs = (
        (state_specs, P(None, None, "data")) if streamed else (state_specs,)
    )
    mapped = jax.shard_map(
        local_superstep,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(state_specs, metrics_specs),
        check_vma=check_vma,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def shard_dp_tp_state(state: TrainState, mesh: Mesh, mcfg: ModelConfig) -> TrainState:
    """Place a single-device TrainState (params already TP-permuted for
    mesh.shape['model'] devices) onto the 2-D mesh."""
    pspecs = tp_mod.tp_specs(mcfg, "model")
    put = lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp))
    return TrainState(
        params=jax.tree_util.tree_map(put, state.params, pspecs),
        m=jax.tree_util.tree_map(put, state.m, pspecs),
        h=put(state.h, P(None, "data", "model")),
        c=put(state.c, P(None, "data", "model")),
        positions=put(state.positions, P("data")),
        step=put(state.step, P()),
        key=put(state.key, P()),
    )
