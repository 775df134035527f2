"""Sequence-pipelining (time-segment) tests: the pipelined schedule must
match the single-device model exactly — loss, gradients, final stream
state — for both loss modes and multi-layer stacks, and through a full
training superstep including cursor wraps and randomized stream resets
(state is replicated, so even the reset RNG stream matches bit-for-bit)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigen_lstm_tpu import DataConfig, ModelConfig, TrainConfig
from eigen_lstm_tpu.models import lstm as model
from eigen_lstm_tpu.parallel import mesh as mesh_mod
from eigen_lstm_tpu.parallel import sp as sp_mod
from eigen_lstm_tpu.train.trainer import Trainer


def setup(num_layers=1, hidden=16, s=16, b=8, seed=0, loss_mode="all"):
    cfg = ModelConfig(
        vocab=32, hidden=hidden, num_layers=num_layers,
        loss_mode=loss_mode, seed=seed,
    )
    params = model.init_params(cfg)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    h0 = jnp.asarray(rng.normal(size=(num_layers, b, hidden)) * 0.1, jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(num_layers, b, hidden)) * 0.1, jnp.float32)
    return cfg, params, ids, targets, h0, c0


@pytest.mark.parametrize(
    "num_layers,n_dev,n_chunks,loss_mode",
    [
        (1, 2, 4, "all"),
        (1, 4, 2, "all"),
        (1, 8, 4, "all"),
        (2, 4, 4, "all"),     # whole stack per time segment
        (1, 4, 4, "last"),
        (2, 2, 2, "last"),
        (1, 8, 1, "all"),     # single chunk: pure sequential handoff
    ],
)
def test_sp_matches_single_device(num_layers, n_dev, n_chunks, loss_mode):
    cfg, params, ids, targets, h0, c0 = setup(num_layers, loss_mode=loss_mode)
    mesh = mesh_mod.make_mesh(n_dev, axis="seq")
    fn = sp_mod.make_sp_loss_and_grad(cfg, mesh, n_chunks)
    loss_sp, bits_sp, hT_sp, cT_sp, grads_sp = fn(params, ids, targets, h0, c0)

    loss_ref, ((hT_ref, cT_ref), bits_ref) = model.loss_fn(
        params, ids, targets, h0, c0, cfg
    )
    np.testing.assert_allclose(float(loss_sp), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(float(bits_sp), float(bits_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(hT_sp), np.asarray(hT_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(cT_sp), np.asarray(cT_ref), rtol=1e-5, atol=1e-6
    )
    grads_ref = jax.grad(
        lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg)[0]
    )(params)
    flat_ref = jax.tree_util.tree_flatten_with_path(grads_ref)[0]
    flat_sp = jax.tree_util.tree_leaves(grads_sp)
    for (path, a), b in zip(flat_ref, flat_sp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6,
            err_msg=f"sp grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_sp_training_superstep_matches_single_device():
    """Full trainer trajectory — params, cursors, stream state — after
    several supersteps with wraps and randomized resets."""
    mcfg = ModelConfig(vocab=256, hidden=16, num_layers=1, loss_mode="all", seed=3)
    dcfg = DataConfig(path="", train_percent=1.0, batch=8, seq=8, reset_std=0.1)
    tcfg = TrainConfig(lr=0.1, superstep=3, steps=12, eval_every_s=1e9,
                       seed=7, pp_chunks=2)
    rng = np.random.RandomState(0)
    data = rng.randint(0, 256, size=97, dtype=np.uint8)

    tr_ref = Trainer(mcfg, dcfg, tcfg, data, None)
    tr_sp = Trainer(mcfg, dcfg, tcfg, data, None,
                    mesh=mesh_mod.make_mesh(4, axis="seq"), parallel="sp")
    tr_ref.run(steps=tcfg.steps, quiet=True)
    tr_sp.run(steps=tcfg.steps, quiet=True)
    np.testing.assert_array_equal(
        np.asarray(tr_ref.state.positions), np.asarray(tr_sp.state.positions)
    )
    # the psum of per-segment partial grads reassociates float sums, so the
    # trajectories agree to accumulation noise, not bitwise (measured
    # ~1e-6/step on the params; loss and grad-norm match to 6 decimals)
    for a, b in zip(
        jax.tree_util.tree_leaves(tr_ref.state.params),
        jax.tree_util.tree_leaves(tr_sp.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5
        )
    np.testing.assert_allclose(
        np.asarray(tr_ref.state.h), np.asarray(tr_sp.state.h),
        rtol=1e-3, atol=5e-5,
    )
    np.testing.assert_allclose(
        tr_ref.last_metrics["train_bpc"], tr_sp.last_metrics["train_bpc"],
        rtol=1e-4,
    )


def test_sp_rejects_bad_shapes():
    mcfg = ModelConfig(vocab=32, hidden=16, num_layers=1, seed=0)
    dcfg = DataConfig(path="", train_percent=1.0, batch=8, seq=10)
    tcfg = TrainConfig(superstep=2, pp_chunks=2)
    data = np.arange(64, dtype=np.uint8)
    mesh = mesh_mod.make_mesh(4, axis="seq")
    with pytest.raises(ValueError, match="not divisible"):
        sp_mod.make_sp_superstep(mcfg, dcfg, tcfg, jnp.asarray(data), mesh)


def test_dp_sp_training_matches_single_device():
    """2-D (data x seq) composition: batch sharded over data, window
    pipelined over seq — full trainer trajectory must match the
    single-device path (reset_std=0 so the per-shard RNG folds are inert)."""
    from eigen_lstm_tpu.train.trainer import TrainState, make_superstep

    mcfg = ModelConfig(vocab=256, hidden=16, num_layers=1, loss_mode="all", seed=3)
    dcfg = DataConfig(path="", train_percent=1.0, batch=8, seq=8)
    tcfg = TrainConfig(lr=0.1, superstep=3, steps=6, eval_every_s=1e9,
                       seed=7, pp_chunks=2)
    rng = np.random.RandomState(0)
    data = rng.randint(0, 256, size=197, dtype=np.uint8)

    tr = Trainer(mcfg, dcfg, tcfg, data, None)
    single = make_superstep(mcfg, dcfg, tcfg, tr.corpus, donate=False)
    s_ref, m_ref = single(tr.state)

    mesh = sp_mod.make_mesh_dp_sp(2, 4)
    step = sp_mod.make_dp_sp_superstep(
        mcfg, dcfg, tcfg, tr.corpus, mesh, donate=False
    )
    s_2d, m_2d = step(sp_mod.shard_dp_sp_state(tr.state, mesh))

    np.testing.assert_allclose(
        float(m_ref["bits_mean"]), float(m_2d["bits_mean"]), rtol=1e-5
    )
    # the seq psum + data pmean reassociate the batch mean the single
    # device computes in one reduction; tolerances are accumulation noise
    # compounded over the superstep's Adagrad updates
    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref.params),
        jax.tree_util.tree_leaves(s_2d.params),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=3e-4
        )
    np.testing.assert_array_equal(
        np.asarray(s_ref.positions), np.asarray(s_2d.positions)
    )
    np.testing.assert_allclose(
        np.asarray(s_ref.h), np.asarray(s_2d.h), rtol=1e-3, atol=3e-4
    )


def test_dp_sp_rejects_bad_shapes():
    mcfg = ModelConfig(vocab=32, hidden=16, num_layers=1, seed=0)
    dcfg = DataConfig(path="", train_percent=1.0, batch=6, seq=8)
    tcfg = TrainConfig(superstep=2, pp_chunks=2)
    data = np.arange(64, dtype=np.uint8)
    mesh = sp_mod.make_mesh_dp_sp(4, 2)
    with pytest.raises(ValueError, match="not divisible"):
        sp_mod.make_dp_sp_superstep(mcfg, dcfg, tcfg, jnp.asarray(data), mesh)


def test_dp_sp_traces_with_pallas_cell(monkeypatch):
    """Regression: under the vma-checked 2-D (data x seq) mesh the Pallas
    cell's out_shapes must carry the {data, seq} union (derived from the
    inputs, ops/pallas_cell.py _vma_of) — binding only the seq axis made
    lax.scan reject the carry types at trace time. eval_shape exercises the
    abstract eval of the real (non-interpret) kernel path without running."""
    from eigen_lstm_tpu.ops import pallas_cell as pc
    from eigen_lstm_tpu.ops.dispatch import select_cell_fn

    monkeypatch.setattr(pc, "_use_interpret", lambda: False)
    pc._make_fused_seq.cache_clear()
    pc._make_fused_embed_seq.cache_clear()
    try:
        mcfg = ModelConfig(vocab=256, hidden=128, num_layers=1,
                           loss_mode="all", seed=0)
        dcfg = DataConfig(path="", train_percent=1.0, batch=16, seq=8)
        tcfg = TrainConfig(lr=0.1, superstep=1, eval_every_s=1e9, pp_chunks=2)
        data = np.arange(200, dtype=np.uint8)
        corpus = jnp.asarray(data)

        cell_fn = functools.partial(pc.pallas_scan_layer)
        cell_fn.embed_layer0 = pc.pallas_embed_layer0
        mesh = sp_mod.make_mesh_dp_sp(2, 4)
        step = sp_mod.make_dp_sp_superstep(
            mcfg, dcfg, tcfg, corpus, mesh, cell_fn=cell_fn, donate=False
        )
        tr = Trainer(mcfg, dcfg, tcfg, data, None)
        state = sp_mod.shard_dp_sp_state(tr.state, mesh)
        out = jax.eval_shape(step, state)   # trace-only: vma typing check
        assert out is not None
    finally:
        pc._make_fused_seq.cache_clear()
        pc._make_fused_embed_seq.cache_clear()
