"""2-D (data x model) mesh training tests: must match single-device exactly."""

import jax
import numpy as np

from eigen_lstm_tpu import DataConfig, ModelConfig, TrainConfig
from eigen_lstm_tpu.parallel import dp_tp as dp_tp_mod
from eigen_lstm_tpu.parallel import tp as tp_mod
from eigen_lstm_tpu.train.trainer import TrainState, Trainer, make_superstep


def test_dp_tp_matches_single_device():
    cfg = ModelConfig(vocab=128, hidden=16, num_layers=1, loss_mode="all", seed=0)
    dcfg = DataConfig(batch=8, seq=8, train_percent=1.0)
    tcfg = TrainConfig(lr=0.1, superstep=3, eval_every_s=1e9)
    data = np.tile(np.arange(31, dtype=np.uint8) + 60, 500)
    tr = Trainer(cfg, dcfg, tcfg, data, None)

    single = make_superstep(cfg, dcfg, tcfg, tr.corpus, donate=False)
    s1, m1 = single(tr.state)

    mesh = dp_tp_mod.make_mesh_2d(4, 2)
    n_model = 2
    state0 = TrainState(
        tp_mod.permute_params_for_tp(tr.state.params, n_model),
        tp_mod.permute_params_for_tp(tr.state.m, n_model),
        tr.state.h, tr.state.c, tr.state.positions, tr.state.step, tr.state.key,
    )
    step2d = dp_tp_mod.make_dp_tp_superstep(cfg, dcfg, tcfg, tr.corpus, mesh, donate=False)
    s2, m2 = step2d(dp_tp_mod.shard_dp_tp_state(state0, mesh, cfg))

    np.testing.assert_allclose(float(m1["bits_mean"]), float(m2["bits_mean"]), rtol=1e-5)
    ref_perm = tp_mod.permute_params_for_tp(s1.params, n_model)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_perm), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s1.positions), np.asarray(s2.positions))


def test_dp_tp_learns():
    cfg = ModelConfig(vocab=128, hidden=32, num_layers=1, loss_mode="all", seed=0)
    dcfg = DataConfig(batch=8, seq=8, train_percent=1.0)
    tcfg = TrainConfig(lr=0.1, superstep=5, eval_every_s=1e9)
    data = np.tile(np.arange(17, dtype=np.uint8) + 65, 1200)
    tr = Trainer(cfg, dcfg, tcfg, data, None)
    mesh = dp_tp_mod.make_mesh_2d(2, 4)
    state = dp_tp_mod.shard_dp_tp_state(
        TrainState(
            tp_mod.permute_params_for_tp(tr.state.params, 4),
            tp_mod.permute_params_for_tp(tr.state.m, 4),
            tr.state.h, tr.state.c, tr.state.positions, tr.state.step, tr.state.key,
        ),
        mesh, cfg,
    )
    step2d = dp_tp_mod.make_dp_tp_superstep(cfg, dcfg, tcfg, tr.corpus, mesh, donate=False)
    state, m0 = step2d(state)
    first = float(m0["bits_mean"])
    for _ in range(25):
        state, m = step2d(state)
    assert float(m["bits_mean"]) < first - 1.5


def test_mesh_2d_validation():
    import pytest

    with pytest.raises(ValueError, match="need"):
        dp_tp_mod.make_mesh_2d(8, 2)


def test_dp_tp_trainer_checkpoint_roundtrip(tmp_path):
    """Trainer(parallel='dp_tp') end-to-end: train, save, restore into a
    fresh 2-D trainer, continue identically (CLI --dp A --tp B path)."""
    cfg = ModelConfig(vocab=128, hidden=16, num_layers=1, loss_mode="all", seed=0)
    dcfg = DataConfig(batch=8, seq=8, train_percent=1.0)
    tcfg = TrainConfig(lr=0.1, superstep=2, eval_every_s=1e9)
    data = np.tile(np.arange(31, dtype=np.uint8) + 60, 500)
    mesh = dp_tp_mod.make_mesh_2d(4, 2)

    a = Trainer(cfg, dcfg, tcfg, data, None, mesh=mesh, parallel="dp_tp")
    a.state, _ = a.superstep(a.state)
    path = str(tmp_path / "dp_tp_ckpt.npz")
    a.save(path)

    b = Trainer(cfg, dcfg, tcfg, data, None, mesh=mesh, parallel="dp_tp")
    b.restore(path)
    assert b.step == a.step
    for x, y in zip(
        jax.tree_util.tree_leaves(a.canonical_params()),
        jax.tree_util.tree_leaves(b.canonical_params()),
    ):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0, atol=0)
    a.state, ma = a.superstep(a.state)
    b.state, mb = b.superstep(b.state)
    np.testing.assert_allclose(
        float(mb["bits_mean"]), float(ma["bits_mean"]), rtol=1e-6
    )
