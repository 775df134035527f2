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


def _dropout_trainer(data, mode, dropout):
    """A 2-layer trainer in the given parallel mode (all 8), dropout-ready."""
    from eigen_lstm_tpu.parallel.dp_tp import make_mesh_2d
    from eigen_lstm_tpu.parallel.mesh import make_mesh
    from eigen_lstm_tpu.parallel.sp import make_mesh_dp_sp

    mcfg = ModelConfig(
        hidden=16, num_layers=2, loss_mode="all", seed=3, dropout=dropout
    )
    dcfg = DataConfig(path="", train_percent=1.0, batch=8, seq=8)
    mesh = {
        "dp": lambda: make_mesh(4),
        "tp": lambda: make_mesh(4, axis="model"),
        "sp": lambda: make_mesh(4, axis="seq"),
        "pp": lambda: make_mesh(2, axis="stage"),
        "dp_tp": lambda: make_mesh_2d(2, 2),
        "dp_sp": lambda: make_mesh_dp_sp(2, 2),
        "dp_pp": lambda: make_mesh_dp_pp(2, 2),
        "tp_sp": lambda: make_mesh_tp_sp(2, 2),
    }[mode]()
    return Trainer(mcfg, dcfg, TCFG, data, None, mesh=mesh, parallel=mode)


ALL_MODES = ["dp", "tp", "sp", "pp", "dp_tp", "dp_sp", "dp_pp", "tp_sp"]


@pytest.mark.parametrize("mode", ALL_MODES)
def test_dropout_trains_in_every_parallel_mode(data, mode):
    """dropout > 0 is a full training path in all 8 parallel modes (the
    flagship recipe must be runnable everywhere — VERDICT r3 item 5):
    finite loss, masks actually perturb the update (params differ from the
    dropout=0 twin), and the data trajectory (cursors) is untouched."""
    tr_d = _dropout_trainer(data, mode, dropout=0.25)
    tr_0 = _dropout_trainer(data, mode, dropout=0.0)
    tr_d.run(steps=6, quiet=True)
    tr_0.run(steps=6, quiet=True)
    assert np.isfinite(tr_d.last_metrics["train_bpc"])
    np.testing.assert_array_equal(
        np.asarray(tr_d.state.positions), np.asarray(tr_0.state.positions)
    )
    diffs = [
        float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))))
        for a, b in zip(
            jax.tree_util.tree_leaves(tr_d.canonical_params()),
            jax.tree_util.tree_leaves(tr_0.canonical_params()),
        )
    ]
    assert max(diffs) > 1e-6, "dropout had no effect on the update"


def test_tp_dropout_matches_single_device(data):
    """Under pure TP (XLA backend) the dropout masks are bit-identical to
    the single-device `_dropout` stream: both draw per (step-key, layer)
    over the full replicated (S, B, N) hidden sequence. Full training
    trajectories must therefore agree to fp tolerance."""
    from eigen_lstm_tpu.parallel.mesh import make_mesh

    mcfg = ModelConfig(
        hidden=16, num_layers=2, loss_mode="all", seed=3, dropout=0.3
    )
    dcfg = DataConfig(path="", train_percent=1.0, batch=8, seq=8)
    single = Trainer(mcfg, dcfg, TCFG, data, None)
    tp_tr = Trainer(
        mcfg, dcfg, TCFG, data, None,
        mesh=make_mesh(4, axis="model"), parallel="tp",
    )
    single.run(steps=TCFG.steps, quiet=True)
    tp_tr.run(steps=TCFG.steps, quiet=True)
    # 1e-4: identical masks, but TP's psum reduces in a different order than
    # the single-device dot — a few 2e-5 excursions after 9 steps are fp
    # noise, not a mask mismatch (a wrong mask would diverge by O(1))
    _params_close(single.canonical_params(), tp_tr.canonical_params(), 1e-4)
    assert abs(
        single.last_metrics["train_bpc"] - tp_tr.last_metrics["train_bpc"]
    ) < 1e-4


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
