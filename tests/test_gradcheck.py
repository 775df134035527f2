"""Numerical gradient checking — reproduces the reference's core oracle
(SURVEY.md §4.1): central differences vs jax.grad BPTT, thresholds
max ≤ 1e-1 / mean ≤ 1e-3 from lstm_eigen_class/lstm.cc:250-304.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigen_lstm_tpu import ModelConfig
from eigen_lstm_tpu.models import lstm as model
from eigen_lstm_tpu.utils.gradcheck import check_gradients


@pytest.mark.parametrize("variant", ["reference", "standard"])
@pytest.mark.parametrize("loss_mode", ["last", "all"])
def test_gradcheck(x64, variant, loss_mode):
    cfg = ModelConfig(
        vocab=12,
        hidden=6,
        num_layers=1,
        cell_variant=variant,
        loss_mode=loss_mode,
        param_dtype="float64",
        compute_dtype="float64",
        seed=3,
    )
    params = model.init_params(cfg)
    rng = np.random.default_rng(7)
    s, b = 6, 2
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    h0, c0 = model.init_state(cfg, b)
    # non-zero initial state exercises the f-gate path
    h0 = h0 + 0.1
    c0 = c0 - 0.1

    loss_of = jax.jit(lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg)[0])
    grads = jax.grad(lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg)[0])(params)
    results = check_gradients(loss_of, params, grads, samples_per_tensor=60, seed=0)
    for name, res in results.items():
        assert res.passed, f"{name}: max={res.max_rel_err:.3e} mean={res.mean_rel_err:.3e}"


def test_gradcheck_stacked(x64):
    """Multi-layer BPTT gradients (new capability vs the 1-layer reference)."""
    cfg = ModelConfig(
        vocab=10,
        hidden=5,
        num_layers=2,
        loss_mode="all",
        param_dtype="float64",
        compute_dtype="float64",
        init_std=0.1,
        seed=5,
    )
    params = model.init_params(cfg)
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (4, 2)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (4, 2)), jnp.int32)
    h0, c0 = model.init_state(cfg, 2)

    loss_of = jax.jit(lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg)[0])
    grads = jax.grad(lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg)[0])(params)
    results = check_gradients(
        loss_of, params, grads, samples_per_tensor=40, seed=1, floor=1e-8
    )
    for name, res in results.items():
        assert res.passed, f"{name}: max={res.max_rel_err:.3e} mean={res.mean_rel_err:.3e}"


def test_gradcheck_exhaustive_small_model(x64):
    """The reference's exhaustive mode (lstm_eigen_class/lstm.h:131-156):
    every element of every tensor checked, on a tiny model."""
    cfg = ModelConfig(
        vocab=6, hidden=4, num_layers=1, loss_mode="all",
        param_dtype="float64", compute_dtype="float64", seed=9,
    )
    params = model.init_params(cfg)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (4, 2)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (4, 2)), jnp.int32)
    h0, c0 = model.init_state(cfg, 2)
    loss_of = jax.jit(lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg)[0])
    grads = jax.grad(lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg)[0])(params)
    results = check_gradients(
        loss_of, params, grads, samples_per_tensor=10**9, seed=0, floor=1e-7
    )
    n_total = sum(r.n_checked for r in results.values())
    from eigen_lstm_tpu.train.metrics import param_count

    assert n_total == param_count(cfg)  # literally every parameter
    for name, r in results.items():
        assert r.passed, f"{name}: max={r.max_rel_err:.3e} mean={r.mean_rel_err:.3e}"


@pytest.mark.parametrize("variant", ["reference", "standard"])
def test_gradcheck_pallas_interpret(x64, variant):
    """FD gradcheck against the fused Pallas recurrence kernel itself
    (interpret mode, float64 end-to-end) — closing the oracle gap between
    the kernels and numerical ground truth (VERDICT r2 next #9). The kernel
    family threads a float64 accumulator dtype under the interpreter for
    exactly this test; on hardware it is always float32."""
    import functools

    from eigen_lstm_tpu.ops import pallas_cell as pc

    cfg = ModelConfig(
        vocab=12,
        hidden=8,
        num_layers=1,
        cell_variant=variant,
        loss_mode="all",
        param_dtype="float64",
        compute_dtype="float64",
        seed=3,
    )
    params = model.init_params(cfg)
    rng = np.random.default_rng(7)
    s, b = 6, 2
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    h0, c0 = model.init_state(cfg, b)
    h0 = h0 + 0.1
    c0 = c0 - 0.1

    cell_fn = functools.partial(pc.pallas_scan_layer)
    loss_of = jax.jit(
        lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn)[0]
    )
    grads = jax.grad(
        lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn)[0]
    )(params)
    # sanity: the kernel path really ran in float64 (loss bit-accuracy)
    xla_loss = float(model.loss_fn(params, ids, targets, h0, c0, cfg)[0])
    np.testing.assert_allclose(float(loss_of(params)), xla_loss, rtol=1e-12)
    results = check_gradients(loss_of, params, grads, samples_per_tensor=40, seed=0)
    for name, res in results.items():
        assert res.passed, f"{name}: max={res.max_rel_err:.3e} mean={res.mean_rel_err:.3e}"


def test_gradcheck_tied_embeddings(x64):
    """FD oracle through the tied-embedding substitution (W_eff = Why^T @ W0):
    the Why gradient must carry both the head and embedding cotangents
    exactly (ModelConfig.tie_embeddings, a rebuild extension)."""
    cfg = ModelConfig(
        vocab=12, hidden=6, num_layers=1, loss_mode="all",
        param_dtype="float64", compute_dtype="float64", seed=3,
        tie_embeddings=True, init_std=0.1,
    )
    params = model.init_params(cfg)
    rng = np.random.default_rng(9)
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (6, 2)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (6, 2)), jnp.int32)
    h0, c0 = model.init_state(cfg, 2)
    loss_of = jax.jit(lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg)[0])
    grads = jax.grad(lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg)[0])(params)
    # init_std 0.1 (as test_gradcheck_stacked): at the default 0.01 the tied
    # projection's gradients are ~1e-5-scale (the signal passes through the
    # embedding twice) and the FD tail is truncation noise. rel_floor as the
    # trainer's --gradcheck-every cadence applies. Spot-verified at 0.01:
    # the largest-|g| entry matches central differences to 6 digits.
    results = check_gradients(
        loss_of, params, grads, samples_per_tensor=60, seed=0, rel_floor=1e-4
    )
    for name, res in results.items():
        assert res.passed, f"{name}: max={res.max_rel_err:.3e} mean={res.mean_rel_err:.3e}"
