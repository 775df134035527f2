"""Pipeline-parallel (layer-block stages) tests: the pipelined schedule must
match the single-device stacked model exactly (same recurrence, same loss),
for both loss modes, for layers_per_stage >= 1, and through a full training
superstep (Adagrad + cursors + stream carry)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigen_lstm_tpu import DataConfig, ModelConfig, TrainConfig
from eigen_lstm_tpu.models import lstm as model
from eigen_lstm_tpu.parallel import mesh as mesh_mod
from eigen_lstm_tpu.parallel import pp as pp_mod
from eigen_lstm_tpu.train.trainer import Trainer


def setup(num_layers, hidden=16, s=8, b=4, seed=0, loss_mode="all"):
    cfg = ModelConfig(
        vocab=32, hidden=hidden, num_layers=num_layers, loss_mode=loss_mode, seed=seed
    )
    params = model.init_params(cfg)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    h0 = jnp.asarray(rng.normal(size=(num_layers, b, hidden)) * 0.1, jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(num_layers, b, hidden)) * 0.1, jnp.float32)
    return cfg, params, ids, targets, h0, c0


def test_pp_params_roundtrip():
    cfg, params, *_ = setup(3)
    back = pp_mod.pp_params_to(pp_mod.pp_params_from(params, cfg), cfg)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize(
    "num_layers,n_stages,n_chunks,loss_mode",
    [
        (2, 2, 4, "all"),
        (4, 4, 2, "all"),
        (8, 8, 4, "all"),
        (4, 2, 4, "all"),    # layers_per_stage = 2
        (8, 4, 2, "all"),    # layers_per_stage = 2
        (4, 4, 4, "last"),
        (4, 2, 2, "last"),   # layers_per_stage = 2, loss on final step only
    ],
)
def test_pp_matches_single_device(num_layers, n_stages, n_chunks, loss_mode):
    cfg, params, ids, targets, h0, c0 = setup(num_layers, loss_mode=loss_mode)
    mesh = mesh_mod.make_mesh(n_stages, axis="stage")
    pp = pp_mod.shard_pp(pp_mod.pp_params_from(params, cfg), mesh)
    fn = pp_mod.make_pp_loss_and_grad(cfg, mesh, n_chunks)
    loss_pp, bits_pp, grads_pp = fn(pp, ids, targets, h0, c0)

    loss_ref, (_, bits_ref) = model.loss_fn(params, ids, targets, h0, c0, cfg)
    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(float(bits_pp), float(bits_ref), rtol=1e-5)

    grads_ref = jax.grad(
        lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg)[0]
    )(params)
    ref_pp = pp_mod.pp_params_from(grads_ref, cfg)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(ref_pp)[0],
        jax.tree_util.tree_leaves(grads_pp),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6,
            err_msg=f"PP grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_pp_rejects_layer_stage_mismatch():
    cfg, params, ids, targets, h0, c0 = setup(2)
    mesh = mesh_mod.make_mesh(4, axis="stage")
    with pytest.raises(ValueError, match="divisible"):
        pp_mod.make_pp_loss_and_grad(cfg, mesh, 2)


@pytest.mark.parametrize(
    "num_layers,n_stages,loss_mode",
    [(2, 2, "all"), (4, 2, "last"), (4, 4, "all")],
)
def test_pp_training_superstep_matches_single_device(
    num_layers, n_stages, loss_mode, x64
):
    """Full PP training path (Trainer parallel='pp'): params after several
    Adagrad supersteps must match the single-device trainer. float64 so the
    comparison is exact (fp32 accumulation order differs across the chunked
    schedule and is amplified by Adagrad's rsqrt at tiny m)."""
    mcfg = ModelConfig(
        vocab=32, hidden=16, num_layers=num_layers, loss_mode=loss_mode, seed=0,
        param_dtype="float64", compute_dtype="float64",
    )
    dcfg = DataConfig(batch=4, seq=8, train_percent=1.0)
    tcfg = TrainConfig(
        lr=0.1, superstep=3, eval_every_s=1e9, warmup_steps=0, pp_chunks=4
    )
    data = np.tile(np.arange(31, dtype=np.uint8), 100)

    ref = Trainer(mcfg, dcfg, tcfg, data, None)
    pp = Trainer(
        mcfg, dcfg, tcfg, data, None,
        mesh=mesh_mod.make_mesh(n_stages, axis="stage"),
        parallel="pp",
    )
    for _ in range(2):
        ref.state, m_ref = ref.superstep(ref.state)
        pp.state, m_pp = pp.superstep(pp.state)
    np.testing.assert_allclose(
        float(m_pp["bits_mean"]), float(m_ref["bits_mean"]), rtol=1e-5
    )
    ref_leaves = jax.tree_util.tree_leaves(ref.state.params)
    pp_leaves = jax.tree_util.tree_leaves(pp.canonical_params())
    for a, b in zip(ref_leaves, pp_leaves):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-9, atol=1e-12
        )


def test_pp_checkpoint_roundtrip(tmp_path):
    """Save from a PP trainer, restore into a fresh PP trainer — canonical
    checkpoint layout is parallelism-agnostic."""
    mcfg = ModelConfig(vocab=32, hidden=16, num_layers=2, loss_mode="all", seed=0)
    dcfg = DataConfig(batch=4, seq=8, train_percent=1.0)
    tcfg = TrainConfig(lr=0.1, superstep=2, eval_every_s=1e9, pp_chunks=4)
    data = np.tile(np.arange(31, dtype=np.uint8), 100)
    mesh = mesh_mod.make_mesh(2, axis="stage")

    a = Trainer(mcfg, dcfg, tcfg, data, None, mesh=mesh, parallel="pp")
    a.state, _ = a.superstep(a.state)
    path = str(tmp_path / "pp_ckpt.npz")
    a.save(path)

    b = Trainer(mcfg, dcfg, tcfg, data, None, mesh=mesh, parallel="pp")
    b.restore(path)
    assert b.step == a.step
    for x, y in zip(
        jax.tree_util.tree_leaves(a.canonical_params()),
        jax.tree_util.tree_leaves(b.canonical_params()),
    ):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0, atol=0)
    # training continues identically after restore
    a.state, ma = a.superstep(a.state)
    b.state, mb = b.superstep(b.state)
    np.testing.assert_allclose(
        float(mb["bits_mean"]), float(ma["bits_mean"]), rtol=1e-6
    )
