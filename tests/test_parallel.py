"""Data-parallel tests on the 8-virtual-device CPU mesh.

The multi-device analogue the reference never had (SURVEY.md §4): a DP run
over N devices must match a single-device run with the same global batch —
psum-gradient equivalence — and params must stay replicated.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigen_lstm_tpu import DataConfig, ModelConfig, TrainConfig
from eigen_lstm_tpu.data import corpus as corpus_mod
from eigen_lstm_tpu.parallel import dp as dp_mod
from eigen_lstm_tpu.parallel import mesh as mesh_mod
from eigen_lstm_tpu.train.trainer import Trainer, make_superstep


def build(mcfg=None, dcfg=None, tcfg=None, n=20000):
    rng = np.random.default_rng(0)
    base = np.tile(np.arange(17, dtype=np.uint8) + 65, n // 17 + 1)[:n]
    data = base.copy()
    mcfg = mcfg or ModelConfig(hidden=16, num_layers=1, loss_mode="all", seed=0)
    dcfg = dcfg or DataConfig(batch=16, seq=8, train_percent=1.0)
    tcfg = tcfg or TrainConfig(lr=0.1, superstep=4, eval_every_s=1e9)
    return mcfg, dcfg, tcfg, data


def test_mesh_creation():
    mesh = mesh_mod.make_mesh(8)
    assert mesh.devices.size == 8
    mesh4 = mesh_mod.make_mesh(4)
    assert mesh4.devices.size == 4
    with pytest.raises(ValueError):
        mesh_mod.make_mesh(64)


def test_dp_matches_single_device():
    """DP over 8 devices == single-device with the same global batch, exactly
    (same windows, same grads after psum/pmean, same Adagrad updates)."""
    mcfg, dcfg, tcfg, data = build()
    tr = Trainer(mcfg, dcfg, tcfg, data, None)
    state0 = tr.state

    # single-device run
    single = make_superstep(mcfg, dcfg, tcfg, tr.corpus, donate=False)
    s1, m1 = single(state0)

    # DP run from the identical initial state
    mesh = mesh_mod.make_mesh(8)
    dp_step = dp_mod.make_dp_superstep(
        mcfg, dcfg, tcfg, tr.corpus, mesh, donate=False
    )
    sharded = dp_mod.shard_state(state0, mesh)
    s2, m2 = dp_step(sharded)

    np.testing.assert_allclose(
        float(m1["bits_mean"]), float(m2["bits_mean"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s1.params.Why), np.asarray(s2.params.Why), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s1.params.layers[0].U),
        np.asarray(s2.params.layers[0].U),
        rtol=1e-4,
        atol=1e-6,
    )
    np.testing.assert_array_equal(np.asarray(s1.positions), np.asarray(s2.positions))


def test_dp_params_stay_replicated():
    """After several supersteps every device holds identical parameters."""
    mcfg, dcfg, tcfg, data = build()
    tr = Trainer(mcfg, dcfg, tcfg, data, None)
    mesh = mesh_mod.make_mesh(8)
    dp_step = dp_mod.make_dp_superstep(mcfg, dcfg, tcfg, tr.corpus, mesh, donate=False)
    state = dp_mod.shard_state(tr.state, mesh)
    for _ in range(3):
        state, metrics = dp_step(state)
    # pull per-device copies and compare
    why = state.params.Why
    shards = [np.asarray(s.data) for s in why.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    assert np.isfinite(float(metrics["bits_mean"]))


def test_dp_learns():
    mcfg, dcfg, tcfg, data = build()
    tr = Trainer(mcfg, dcfg, tcfg, data, None)
    mesh = mesh_mod.make_mesh(8)
    dp_step = dp_mod.make_dp_superstep(mcfg, dcfg, tcfg, tr.corpus, mesh, donate=False)
    state = dp_mod.shard_state(tr.state, mesh)
    state, m0 = dp_step(state)
    first = float(m0["bits_mean"])
    for _ in range(30):
        state, metrics = dp_step(state)
    assert float(metrics["bits_mean"]) < first - 2.0


def test_dp_batch_divisibility_check():
    mcfg, dcfg, tcfg, data = build(dcfg=DataConfig(batch=10, seq=8, train_percent=1.0))
    mesh = mesh_mod.make_mesh(8)
    with pytest.raises(ValueError, match="not divisible"):
        dp_mod.make_dp_superstep(mcfg, dcfg, tcfg, jnp.asarray(data), mesh)


def test_trainer_with_mesh_end_to_end(tmp_path):
    """Trainer(mesh=...) — the user-facing DP path: trains, evals, samples,
    checkpoints and resumes on an 8-device mesh."""
    mcfg, dcfg, tcfg, data = build()
    mesh = mesh_mod.make_mesh(8)
    tr = Trainer(mcfg, dcfg, tcfg, data[:18000], data[18000:], mesh=mesh)
    tr.state, m0 = tr.superstep(tr.state)
    first = float(m0["bits_mean"])
    tr.run(steps=80, quiet=True)
    assert tr.last_metrics["train_bpc"] < first - 1.0
    bpc = tr.evaluate(max_chars=1000)
    assert np.isfinite(bpc)
    text = tr.sample(length=32)
    assert len(text) == 32
    path = str(tmp_path / "dp.npz")
    tr.save(path)
    tr2 = Trainer(mcfg, dcfg, tcfg, data[:18000], data[18000:], mesh=mesh)
    tr2.restore(path)
    np.testing.assert_allclose(
        np.asarray(tr2.state.params.Why), np.asarray(tr.state.params.Why)
    )
    tr2.run(steps=20, quiet=True)
    assert np.isfinite(tr2.last_metrics["train_bpc"])
