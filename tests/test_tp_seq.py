"""Sequence-level TP kernel (in-kernel ICI all-gather / reduce-scatter,
ops/pallas_tp_seq.py) run in TPU *interpret mode* on the virtual CPU mesh —
the remote DMAs and semaphores are simulated, so the kernel's real exchange
protocol is what executes. A race-detection pass guards the parity-buffer
synchronization.

Harness note: interpret-mode pallas cannot run under vma-checked shard_map
(the interpreter's internal ops mix varying/invariant types), and with
``check_vma=False`` the transpose of the head's ``psum`` multiplies every
gradient by exactly ndev — for the XLA backend too (verified here by
``test_unchecked_harness_factor``). Exactness is therefore anchored in two
hops: losses match the single-device model directly (forward is unaffected),
and gradients/training trajectories match the XLA TP backend *under the
identical unchecked harness* — which tests/test_tp.py in turn anchors to the
single-device model under the checked harness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigen_lstm_tpu import ModelConfig
from eigen_lstm_tpu.models import lstm as model
from eigen_lstm_tpu.ops import pallas_tp_seq as seq_mod
from eigen_lstm_tpu.parallel import mesh as mesh_mod
from eigen_lstm_tpu.parallel import tp as tp_mod


def setup(num_layers=1, hidden=16, s=6, b=4, seed=0, **cfg_kw):
    cfg = ModelConfig(
        vocab=32, hidden=hidden, num_layers=num_layers, seed=seed,
        **cfg_kw,
    )
    params = model.init_params(cfg)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    h0 = jnp.asarray(rng.normal(size=(num_layers, b, hidden)) * 0.1, jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(num_layers, b, hidden)) * 0.1, jnp.float32)
    return cfg, params, ids, targets, h0, c0


def test_unchecked_harness_factor():
    """Documents the harness: with check_vma=False the psum transpose scales
    XLA-backend grads by exactly ndev; the forward loss is untouched. The
    parity tests below therefore compare backends under the same harness."""
    cfg, params, ids, targets, h0, c0 = setup()
    ndev = 4
    mesh = mesh_mod.make_mesh(ndev, axis="model")
    sp = tp_mod.shard_tp_params(tp_mod.permute_params_for_tp(params, ndev), mesh)
    fn = tp_mod.make_tp_loss_and_grad(cfg, mesh, backend="xla", check_vma=False)
    loss, _, grads = fn(sp, ids, targets, h0, c0)
    loss_ref, _ = model.loss_fn(params, ids, targets, h0, c0, cfg)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-6)
    ref = np.asarray(
        tp_mod.permute_params_for_tp(
            jax.grad(lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg)[0])(
                params
            ),
            ndev,
        ).layers[0].W
    )
    got = np.asarray(grads.layers[0].W)
    nz = np.abs(ref) > 1e-12
    np.testing.assert_allclose(got[nz] / ref[nz], ndev, rtol=1e-4)


@pytest.mark.parametrize(
    "num_layers,ndev,loss_mode",
    [
        (1, 2, "all"),
        (1, 4, "all"),
        (1, 8, "all"),
        (2, 4, "all"),
        (1, 4, "last"),
    ],
)
def test_tp_seq_matches_xla_backend(num_layers, ndev, loss_mode):
    """Kernel vs XLA TP scan under the identical harness: loss (also vs the
    single-device model directly) and every gradient leaf."""
    cfg, params, ids, targets, h0, c0 = setup(
        num_layers=num_layers, loss_mode=loss_mode
    )
    _assert_tp_seq_matches(cfg, params, ids, targets, h0, c0, ndev)


def test_tp_seq_matches_xla_backend_narrow_params():
    """param_dtype narrower than compute_dtype: the kernel must round the
    carried h/c to param dtype every step exactly like the XLA scan does
    (missing rounding diverges the trajectories)."""
    cfg, params, ids, targets, h0, c0 = setup(
        param_dtype="bfloat16", compute_dtype="float32"
    )
    # bf16 params: both backwards round in different orders at bf16 scale,
    # so grads agree to bf16 epsilon, not f32
    _assert_tp_seq_matches(cfg, params, ids, targets, h0, c0, 4,
                           grad_rtol=5e-2, grad_atol=1e-4)


def _assert_tp_seq_matches(cfg, params, ids, targets, h0, c0, ndev,
                           grad_rtol=1e-4, grad_atol=1e-6):
    mesh = mesh_mod.make_mesh(ndev, axis="model")
    sp = tp_mod.shard_tp_params(tp_mod.permute_params_for_tp(params, ndev), mesh)

    fn_seq = tp_mod.make_tp_loss_and_grad(
        cfg, mesh, backend="pallas_seq", check_vma=False
    )
    fn_xla = tp_mod.make_tp_loss_and_grad(
        cfg, mesh, backend="xla", check_vma=False
    )
    loss_k, bits_k, grads_k = fn_seq(sp, ids, targets, h0, c0)
    loss_x, bits_x, grads_x = fn_xla(sp, ids, targets, h0, c0)

    loss_ref, (_, bits_ref) = model.loss_fn(params, ids, targets, h0, c0, cfg)
    np.testing.assert_allclose(float(loss_k), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(float(bits_k), float(bits_ref), rtol=1e-5)

    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(grads_x)[0],
        jax.tree_util.tree_leaves(grads_k),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=grad_rtol, atol=grad_atol,
            err_msg=f"tp_seq grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_tp_seq_single_step_window():
    """S=1 exercises the first==last grid-step edge (init, cut cotangents,
    and the final reduce-scatter all land on one step)."""
    cfg, params, ids, targets, h0, c0 = setup(s=1)
    mesh = mesh_mod.make_mesh(4, axis="model")
    sp = tp_mod.shard_tp_params(tp_mod.permute_params_for_tp(params, 4), mesh)
    fn_seq = tp_mod.make_tp_loss_and_grad(
        cfg, mesh, backend="pallas_seq", check_vma=False
    )
    fn_xla = tp_mod.make_tp_loss_and_grad(cfg, mesh, backend="xla", check_vma=False)
    loss_k, _, grads_k = fn_seq(sp, ids, targets, h0, c0)
    loss_x, _, grads_x = fn_xla(sp, ids, targets, h0, c0)
    np.testing.assert_allclose(float(loss_k), float(loss_x), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads_x), jax.tree_util.tree_leaves(grads_k)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6)


def test_tp_seq_race_detection_clean():
    """The parity-buffered exchange protocol under the interpreter's
    happens-before race detector: fwd + bwd must be race-free and the
    forward must produce the exact single-device values."""
    cfg, params, ids, targets, h0, c0 = setup(s=5, b=4, hidden=16)
    ndev = 4
    mesh = mesh_mod.make_mesh(ndev, axis="model")
    pperm = tp_mod.permute_params_for_tp(params, ndev)
    layer = pperm.layers[0]
    from jax.sharding import PartitionSpec as P

    def local(U, xw, h0_d, c0_d, w):
        def f(u):
            h_seq_d, (hT, cT) = seq_mod.tp_seq_lstm(
                u, xw, h0_d, c0_d, cfg, "model", ndev, interpret_kind="races"
            )
            return (
                jnp.sum(h_seq_d * w) + jnp.sum(hT) + 0.5 * jnp.sum(cT),
                (h_seq_d, hT, cT),
            )

        (val, outs), gU = jax.value_and_grad(f, has_aux=True)(U)
        return val, outs, gU

    s, b = ids.shape
    rng = np.random.default_rng(3)
    xw_full = jnp.asarray(layer.W[ids] + layer.b, jnp.float32)
    w_full = jnp.asarray(rng.normal(size=(s, b, cfg.hidden)), jnp.float32)

    mapped = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "model"), P(None, None, "model"), P(None, "model"),
                  P(None, "model"), P(None, None, "model")),
        out_specs=(P(), (P(None, None, "model"), P(None, "model"),
                         P(None, "model")), P(None, "model")),
        check_vma=False,
    ))
    val, (h_seq, hT, cT), gU = mapped(layer.U, xw_full, h0[0], c0[0], w_full)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(gU)))

    # exact reference: the canonical model cell on the UNpermuted weights
    uparams = tp_mod.unpermute_params_from_tp(pperm, ndev)
    _, (hT_ref, cT_ref) = model.forward(
        model.LSTMParams((uparams.layers[0],), uparams.Why, uparams.by),
        ids, h0, c0, cfg,
    )
    np.testing.assert_allclose(
        np.asarray(hT), np.asarray(hT_ref[0]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(cT), np.asarray(cT_ref[0]), rtol=1e-5, atol=1e-6
    )


def test_tp_seq_superstep_matches_xla_backend_training():
    """Full training superstep (Adagrad + cursors + stream carry), kernel vs
    XLA backend under the identical harness — trajectories must agree."""
    from eigen_lstm_tpu import DataConfig, TrainConfig
    from eigen_lstm_tpu.train.trainer import TrainState, Trainer

    cfg = ModelConfig(vocab=32, hidden=16, num_layers=1, loss_mode="all", seed=0)
    dcfg = DataConfig(batch=4, seq=6, train_percent=1.0)
    tcfg = TrainConfig(lr=0.1, superstep=2, eval_every_s=1e9)
    data = np.tile(np.arange(31, dtype=np.uint8) + 60, 500)
    tr = Trainer(cfg, dcfg, tcfg, data, None)

    mesh = mesh_mod.make_mesh(4, axis="model")
    state0 = TrainState(
        tp_mod.permute_params_for_tp(tr.state.params, 4),
        tp_mod.permute_params_for_tp(tr.state.m, 4),
        tr.state.h, tr.state.c, tr.state.positions, tr.state.step, tr.state.key,
    )
    outs = {}
    for backend in ("pallas_seq", "xla"):
        step = tp_mod.make_tp_superstep(
            cfg, dcfg, tcfg, tr.corpus, mesh, donate=False,
            backend=backend, check_vma=False,
        )
        outs[backend] = step(tp_mod.shard_tp_state(state0, mesh, cfg))
    (s_k, m_k), (s_x, m_x) = outs["pallas_seq"], outs["xla"]
    np.testing.assert_allclose(
        float(m_k["bits_mean"]), float(m_x["bits_mean"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_x.params), jax.tree_util.tree_leaves(s_k.params)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_k.h), np.asarray(s_x.h), rtol=1e-4, atol=1e-6
    )


def test_tp_seq_supported_gate():
    cfg = ModelConfig(
        hidden=2048, compute_dtype="bfloat16", residual_dtype="bfloat16"
    )
    assert seq_mod.tp_seq_supported(cfg, 128, 8)
    assert not seq_mod.tp_seq_supported(cfg, 128, 3)       # indivisible
    assert not seq_mod.tp_seq_supported(cfg, 5, 8)         # batch misaligned
    assert not seq_mod.tp_seq_supported(
        ModelConfig(hidden=8192, compute_dtype="bfloat16"), 128, 2
    )                                                      # VMEM blown
    # the bwd kernel's U shard + f32 reduce-scatter buffers exceed VMEM at
    # D=4/H=2048 — the gate must reject it (use D=8 or the per-step backend)
    assert not seq_mod.tp_seq_supported(
        ModelConfig(hidden=2048, compute_dtype="bfloat16"), 128, 4
    )


def test_tp_seq_on_2d_mesh_matches_xla_backend():
    """The kernel's MESH-relative DMA addressing on the (data, model) mesh:
    a full DPxTP training superstep with backend=pallas_seq must track the
    XLA backend exactly under the identical unchecked harness."""
    from eigen_lstm_tpu import DataConfig, TrainConfig
    from eigen_lstm_tpu.parallel import dp_tp as dp_tp_mod
    from eigen_lstm_tpu.train.trainer import TrainState, Trainer

    cfg = ModelConfig(vocab=32, hidden=16, num_layers=1, loss_mode="all", seed=0)
    dcfg = DataConfig(batch=8, seq=6, train_percent=1.0)
    tcfg = TrainConfig(lr=0.1, superstep=2, eval_every_s=1e9)
    data = np.tile(np.arange(31, dtype=np.uint8) + 60, 500)
    tr = Trainer(cfg, dcfg, tcfg, data, None)

    mesh2d = dp_tp_mod.make_mesh_2d(2, 4)
    state0 = TrainState(
        tp_mod.permute_params_for_tp(tr.state.params, 4),
        tp_mod.permute_params_for_tp(tr.state.m, 4),
        tr.state.h, tr.state.c, tr.state.positions, tr.state.step, tr.state.key,
    )
    outs = {}
    for backend in ("pallas_seq", "xla"):
        step = dp_tp_mod.make_dp_tp_superstep(
            cfg, dcfg, tcfg, tr.corpus, mesh2d, donate=False,
            backend=backend, check_vma=False,
        )
        outs[backend] = step(dp_tp_mod.shard_dp_tp_state(state0, mesh2d, cfg))
    (s_k, m_k), (s_x, m_x) = outs["pallas_seq"], outs["xla"]
    np.testing.assert_allclose(
        float(m_k["bits_mean"]), float(m_x["bits_mean"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_x.params), jax.tree_util.tree_leaves(s_k.params)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6)


def test_tp_seq_traces_under_checked_vma_1d(monkeypatch):
    """Advisor r2: the Trainer's real TP ladder runs pallas_seq under the
    DEFAULT vma-checked shard_map on hardware, but every parity test forces
    check_vma=False — leaving the kernel's out_shape vma annotations
    (sds/vma_key) an uncovered trace path. eval_shape the full TP training
    superstep with the real (non-interpret) kernel under check_vma=True,
    exactly as make_tp_superstep builds it on a TPU mesh."""
    from eigen_lstm_tpu import DataConfig, TrainConfig
    from eigen_lstm_tpu.train.trainer import TrainState, Trainer

    monkeypatch.setattr(seq_mod, "_use_interpret", lambda: False)
    seq_mod._make_tp_seq.cache_clear()
    try:
        ndev = 8
        cfg = ModelConfig(vocab=256, hidden=128 * ndev, num_layers=1,
                          loss_mode="all", seed=0)
        from eigen_lstm_tpu import DataConfig as DC
        dcfg = DC(path="", batch=8, seq=6, train_percent=1.0)
        tcfg = TrainConfig(lr=0.1, superstep=1, eval_every_s=1e9)
        data = np.tile(np.arange(31, dtype=np.uint8) + 60, 500)
        tr = Trainer(cfg, dcfg, tcfg, data, None)
        mesh = mesh_mod.make_mesh(ndev, axis="model")
        assert seq_mod.tp_seq_supported(cfg, dcfg.batch, ndev)
        step = tp_mod.make_tp_superstep(
            cfg, dcfg, tcfg, tr.corpus, mesh, donate=False,
            backend="pallas_seq", check_vma=True,
        )
        import dataclasses

        state = tp_mod.shard_tp_state(
            dataclasses.replace(
                tr.state,
                params=tp_mod.permute_params_for_tp(tr.state.params, ndev),
                m=tp_mod.permute_params_for_tp(tr.state.m, ndev),
            ),
            mesh, cfg,
        )
        out = jax.eval_shape(step, state)   # trace-only: vma typing check
        assert out is not None
    finally:
        seq_mod._make_tp_seq.cache_clear()


def test_tp_seq_traces_under_checked_vma_2d(monkeypatch):
    """Same trace check on the 2-D (data x model) mesh, where the kernel's
    out_shape vma must carry the {data, model} union."""
    from eigen_lstm_tpu import DataConfig, TrainConfig
    from eigen_lstm_tpu.parallel import dp_tp as dp_tp_mod
    from eigen_lstm_tpu.train.trainer import TrainState, Trainer

    monkeypatch.setattr(seq_mod, "_use_interpret", lambda: False)
    seq_mod._make_tp_seq.cache_clear()
    try:
        n_model = 4
        cfg = ModelConfig(vocab=256, hidden=128 * n_model, num_layers=1,
                          loss_mode="all", seed=0)
        dcfg = DataConfig(path="", batch=16, seq=6, train_percent=1.0)
        tcfg = TrainConfig(lr=0.1, superstep=1, eval_every_s=1e9)
        data = np.tile(np.arange(31, dtype=np.uint8) + 60, 500)
        tr = Trainer(cfg, dcfg, tcfg, data, None)
        mesh2d = dp_tp_mod.make_mesh_2d(2, n_model)
        state0 = TrainState(
            tp_mod.permute_params_for_tp(tr.state.params, n_model),
            tp_mod.permute_params_for_tp(tr.state.m, n_model),
            tr.state.h, tr.state.c, tr.state.positions, tr.state.step,
            tr.state.key,
        )
        step = dp_tp_mod.make_dp_tp_superstep(
            cfg, dcfg, tcfg, tr.corpus, mesh2d, donate=False,
            backend="pallas_seq", check_vma=True,
        )
        out = jax.eval_shape(
            step, dp_tp_mod.shard_dp_tp_state(state0, mesh2d, cfg)
        )
        assert out is not None
    finally:
        seq_mod._make_tp_seq.cache_clear()
