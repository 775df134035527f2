"""2-D composition meshes that complete the parallelism matrix:
DP x PP (data x stage) and TP x SP (seq x model).

Standard: trajectory parity with the single-device trainer from identical
seeds (the test_dp_tp / test_sp exactness bar) — same windows, same cursor
advance, same Adagrad math, canonical parameters equal to tolerance.
"""

import dataclasses

import jax
import numpy as np
import pytest

from eigen_lstm_tpu import DataConfig, ModelConfig, TrainConfig
from eigen_lstm_tpu.parallel.pp import make_mesh_dp_pp
from eigen_lstm_tpu.parallel.sp import make_mesh_tp_sp
from eigen_lstm_tpu.train.trainer import Trainer

TCFG = TrainConfig(lr=0.1, superstep=3, steps=9, eval_every_s=1e9, seed=7)


def _params_close(p1, p2, tol=1e-5):
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=tol, atol=tol,
        )


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    return rng.randint(0, 256, size=4001, dtype=np.uint8)


def _pair(data, mode, **cfg_kw):
    kw = dict(hidden=16, loss_mode="all", seed=3)
    kw.update(cfg_kw)
    if mode == "dp_pp":
        mcfg = ModelConfig(num_layers=2, **kw)
        dcfg = DataConfig(path="", train_percent=1.0, batch=8, seq=8)
        mesh = make_mesh_dp_pp(2, 2)
    elif mode == "tp_sp":
        mcfg = ModelConfig(num_layers=1, **kw)
        dcfg = DataConfig(path="", train_percent=1.0, batch=8, seq=8)
        mesh = make_mesh_tp_sp(2, 4)
    else:
        raise ValueError(mode)
    single = Trainer(mcfg, dcfg, TCFG, data, None)
    mesh_tr = Trainer(mcfg, dcfg, TCFG, data, None, mesh=mesh, parallel=mode)
    return single, mesh_tr


@pytest.mark.parametrize("mode", ["dp_pp", "tp_sp"])
def test_composition_matches_single_device(data, mode):
    single, mesh_tr = _pair(data, mode)
    single.run(steps=TCFG.steps, quiet=True)
    mesh_tr.run(steps=TCFG.steps, quiet=True)
    assert single.step == mesh_tr.step
    np.testing.assert_array_equal(
        np.asarray(single.state.positions), np.asarray(mesh_tr.state.positions)
    )
    _params_close(single.canonical_params(), mesh_tr.canonical_params())
    _params_close(single.state.h, mesh_tr.state.h)
    _params_close(single.state.c, mesh_tr.state.c)
    assert abs(
        single.last_metrics["train_bpc"] - mesh_tr.last_metrics["train_bpc"]
    ) < 1e-4


@pytest.mark.parametrize("mode", ["dp_pp", "tp_sp"])
def test_composition_loss_last_mode(data, mode, x64):
    """The reference's loss-last objective (class_batch/lstm.cc:308-317)
    through both composed pipelines. float64 so the comparison is exact —
    with only B last-step terms contributing, fp32 pipeline reduction-order
    noise is amplified by Adagrad's rsqrt at tiny m (the test_pp
    convention)."""
    single, mesh_tr = _pair(
        data, mode, loss_mode="last",
        param_dtype="float64", compute_dtype="float64",
    )
    single.run(steps=6, quiet=True)
    mesh_tr.run(steps=6, quiet=True)
    _params_close(single.canonical_params(), mesh_tr.canonical_params(), 1e-9)


@pytest.mark.parametrize("mode", ["dp_pp", "tp_sp"])
def test_composition_learns(data, mode):
    """bpc falls on a periodic corpus (end-to-end training sanity)."""
    periodic = np.tile(np.arange(17, dtype=np.uint8) + 65, 1000)
    single, mesh_tr = _pair(periodic, mode)
    del single
    first = None
    for _ in range(10):
        mesh_tr.state, m = mesh_tr.dispatch_superstep()
        if first is None:
            first = float(m["bits_mean"])
    assert float(m["bits_mean"]) < first - 1.0


@pytest.mark.parametrize("mode", ["dp_pp", "tp_sp"])
def test_composition_checkpoint_roundtrip(data, mode, tmp_path):
    """Save from the composed mesh, restore into a fresh one, continue
    identically (canonical checkpoint interchange)."""
    path = str(tmp_path / "ckpt.npz")
    a_single, a = _pair(data, mode)
    a.run(steps=6, quiet=True)
    a.save(path)
    b_single, b = _pair(data, mode)
    b.restore(path)
    assert b.step == a.step
    a.run(steps=6, quiet=True)
    b.run(steps=6, quiet=True)
    _params_close(a.canonical_params(), b.canonical_params())
    np.testing.assert_array_equal(
        np.asarray(a.state.positions), np.asarray(b.state.positions)
    )


def test_composition_reset_std_runs(data):
    """reset_std > 0 traces and runs on both composed meshes (the stream
    reset RNG folds every mesh axis; exact parity is not required since the
    per-shard folds decorrelate by design)."""
    for mode in ("dp_pp", "tp_sp"):
        _, mesh_tr = _pair(data, mode)
        mesh_tr.dcfg.reset_std  # attribute exists
        mcfg = mesh_tr.mcfg
        dcfg = dataclasses.replace(mesh_tr.dcfg, reset_std=0.05)
        mesh = mesh_tr.mesh
        tr = Trainer(mcfg, dcfg, TCFG, data, None, mesh=mesh, parallel=mode)
        tr.run(steps=3, quiet=True)
        assert np.isfinite(tr.last_metrics["train_bpc"])
