"""Fused in-kernel dropout: lockstep validation against explicit masks.

The resident Pallas kernels apply the inter-layer dropout mask in the
forward epilogue and regenerate it in the backward prologue from the same
(seed, timestep) counter-based hash (ops/pallas_cell.py ``_keep_mask``) —
no mask bits ever touch HBM. These tests pin the contract:

* the mask really is the documented hash (numpy replica, exact bit match);
* gradients through the fused path equal gradients through the XLA path
  with the *identical* masks applied explicitly (float64 lockstep — the
  rebuild's analogue of the reference's CPU/GPU cross-validation,
  ``lstm_eigen_CUDA/lstm.cu:425-496``);
* the carried (hT, cT) state stays unmasked;
* end-to-end training through the Trainer with the fused path converges.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigen_lstm_tpu.config import ModelConfig
from eigen_lstm_tpu.models import lstm as model
from eigen_lstm_tpu.ops import dispatch
from eigen_lstm_tpu.ops import pallas_cell as pc


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _np_masks(dkey, l: int, s: int, b: int, n: int, drop: float):
    seed = int(np.asarray(model._drop_seed(dkey, l))[0])
    return np.stack(
        [pc.host_keep_mask(seed, t, b, n, drop) for t in range(s)]
    )


def _explicit_mask_loss(params, ids, targets, h0, c0, cfg, dkey, masks):
    """XLA-path loss with the kernel's masks applied explicitly: the
    lockstep oracle. ``masks``: per-layer (S, B, N) bool arrays."""
    calls = iter(masks)

    def fake_dropout(x, rate, key):
        m = jnp.asarray(next(calls))
        return jnp.where(m, x / jnp.asarray(1.0 - rate, x.dtype), 0.0)

    orig = model._dropout
    model._dropout = fake_dropout
    try:
        return model.loss_fn(params, ids, targets, h0, c0, cfg, None, dkey)[0]
    finally:
        model._dropout = orig


def _setup(cfg, s, b, seed=7):
    params = model.init_params(cfg)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    h0, c0 = model.init_state(cfg, b)
    return params, ids, targets, h0 + 0.1, c0 - 0.1


def test_forward_mask_is_documented_hash():
    """hdrop == where(np_mask, h/keep, 0) bit-for-bit vs the eval pass."""
    drop = 0.3
    cfg = ModelConfig(vocab=256, hidden=128, num_layers=1, dropout=drop,
                      seed=0)
    params, ids, targets, h0, c0 = _setup(cfg, 6, 16)
    cell_fn = dispatch.select_cell_fn("pallas", cfg, 16, interpret=True)
    assert cell_fn.fused_dropout
    dkey = jax.random.PRNGKey(42)
    h_eval, (hT_e, cT_e) = model.forward(params, ids, h0, c0, cfg, cell_fn)
    h_drop, (hT_d, cT_d) = model.forward(
        params, ids, h0, c0, cfg, cell_fn, dropout_key=dkey
    )
    masks = _np_masks(dkey, 0, 6, 16, cfg.hidden, drop)
    expect = np.where(masks, np.asarray(h_eval) / (1.0 - drop), 0.0)
    np.testing.assert_allclose(np.asarray(h_drop), expect, rtol=1e-6)
    # the carried state is never masked
    np.testing.assert_array_equal(np.asarray(hT_d), np.asarray(hT_e))
    np.testing.assert_array_equal(np.asarray(cT_d), np.asarray(cT_e))
    # and the drop rate is what was asked
    assert abs(float((np.asarray(h_drop) == 0).mean()) - drop) < 0.05


@pytest.mark.parametrize("variant", ["reference", "standard"])
def test_grad_lockstep_vs_explicit_masks(x64, variant):
    """float64: grads through the fused-dropout kernels == grads through
    XLA with the identical masks applied explicitly."""
    drop = 0.25
    cfg = ModelConfig(vocab=16, hidden=8, num_layers=2, cell_variant=variant,
                      loss_mode="all", dropout=drop,
                      param_dtype="float64", compute_dtype="float64", seed=3)
    params, ids, targets, h0, c0 = _setup(cfg, 5, 4)
    dkey = jax.random.PRNGKey(11)

    cell_fn = functools.partial(pc.pallas_scan_layer)
    cell_fn.fused_dropout = True
    loss_p, grads_p = jax.value_and_grad(
        lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn, dkey)[0]
    )(params)

    masks = [
        _np_masks(dkey, l, 5, 4, cfg.hidden, drop) for l in range(2)
    ]
    loss_x, grads_x = jax.value_and_grad(
        lambda p: _explicit_mask_loss(
            p, ids, targets, h0, c0, cfg, dkey, masks
        )
    )(params)

    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-12)
    for (path, a), b_ in zip(
        jax.tree_util.tree_flatten_with_path(grads_p)[0],
        jax.tree_util.tree_leaves(grads_x),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-9, atol=1e-12,
            err_msg=str(path),
        )


def test_embed_kernel_grad_lockstep():
    """The fused-embedding layer-0 kernel's dropout (fwd epilogue + fused
    in-kernel wgrad backward) against the explicit-mask XLA oracle, fp32."""
    drop = 0.4
    cfg = ModelConfig(vocab=256, hidden=128, num_layers=1, loss_mode="all",
                      dropout=drop, seed=5)
    s, b = 4, 8
    params, ids, targets, h0, c0 = _setup(cfg, s, b)
    dkey = jax.random.PRNGKey(13)

    cell_fn = functools.partial(pc.pallas_scan_layer)
    cell_fn.embed_layer0 = pc.pallas_embed_layer0
    cell_fn.fused_dropout = True
    loss_p, grads_p = jax.value_and_grad(
        lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn, dkey)[0]
    )(params)

    masks = [_np_masks(dkey, 0, s, b, cfg.hidden, drop)]
    loss_x, grads_x = jax.value_and_grad(
        lambda p: _explicit_mask_loss(
            p, ids, targets, h0, c0, cfg, dkey, masks
        )
    )(params)

    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-5)
    for (path, a), b_ in zip(
        jax.tree_util.tree_flatten_with_path(grads_p)[0],
        jax.tree_util.tree_leaves(grads_x),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5,
            err_msg=str(path),
        )


def test_masks_invariant_to_batch_split(monkeypatch):
    """n_split half-blocking must not change the mask bits (row_off keeps
    element indices global)."""
    drop = 0.3
    cfg = ModelConfig(vocab=256, hidden=128, num_layers=1, dropout=drop, seed=0)
    params, ids, targets, h0, c0 = _setup(cfg, 4, 16)
    dkey = jax.random.PRNGKey(9)
    cell_fn = functools.partial(pc.pallas_scan_layer)
    cell_fn.embed_layer0 = pc.pallas_embed_layer0
    cell_fn.fused_dropout = True

    def fwd_with(split):
        monkeypatch.setenv("EIGEN_LSTM_BSPLIT", str(split))
        pc._make_fused_embed_seq.cache_clear()
        return model.forward(
            params, ids, h0, c0, cfg, cell_fn, dropout_key=dkey
        )[0]

    try:
        h1 = fwd_with(1)
        h2 = fwd_with(2)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-6)
    finally:
        pc._make_fused_embed_seq.cache_clear()


def test_trainer_fused_dropout_converges():
    """End-to-end: Trainer + pallas interpret backend + dropout>0 trains
    (finite, falling bpc) through the fused path."""
    from eigen_lstm_tpu.config import DataConfig, TrainConfig
    from eigen_lstm_tpu.train.trainer import Trainer

    data = np.frombuffer(
        b"the quick brown fox jumps over the lazy dog. " * 200, np.uint8
    ).copy()
    mcfg = ModelConfig(vocab=256, hidden=128, num_layers=2, dropout=0.2,
                       loss_mode="all", seed=0)
    dcfg = DataConfig(path="", batch=16, seq=8, train_percent=1.0)
    tcfg = TrainConfig(lr=0.1, superstep=5, steps=30, eval_every_s=1e9, seed=5)
    cell_fn = dispatch.select_cell_fn("pallas", mcfg, 16, interpret=True)
    assert getattr(cell_fn, "fused_dropout", False)
    tr = Trainer(mcfg, dcfg, tcfg, data, None, cell_fn=cell_fn)
    m = tr.run(steps=30, quiet=True)
    assert np.isfinite(m["train_bpc"])
    assert m["train_bpc"] < 6.5  # falling from the 8.0 uniform start


# ---------------------------------------------------------------------------
# Tiled-U kernels (the U > VMEM regime): same fused-dropout contract, same
# mask BITS — _keep_mask's global element indexing (col_off/n_total) makes
# the per-chunk masks of the tiled epilogue equal the resident kernel's
# full-row masks, so the two kernel families are interchangeable mid-run.
# ---------------------------------------------------------------------------

from eigen_lstm_tpu.ops.pallas_cell_tiled import (  # noqa: E402
    pallas_tiled_embed_layer0,
    pallas_tiled_scan_layer,
)


def _tiled_fn(wt=128, embed=False):
    fn = functools.partial(pallas_tiled_scan_layer, wt=wt)
    fn.fused_dropout = True
    if embed:
        fn.embed_layer0 = functools.partial(pallas_tiled_embed_layer0, wt=wt)
    return fn


def test_tiled_forward_mask_is_documented_hash():
    """Tiled hdrop == where(np_mask, h/keep, 0) — exercises col_off (two
    128-wide chunks per gate at N=256, wt=128)."""
    drop = 0.3
    cfg = ModelConfig(vocab=256, hidden=256, num_layers=1, dropout=drop,
                      seed=0)
    params, ids, targets, h0, c0 = _setup(cfg, 5, 8)
    dkey = jax.random.PRNGKey(21)
    cell_fn = _tiled_fn()
    h_eval, (hT_e, cT_e) = model.forward(params, ids, h0, c0, cfg, cell_fn)
    h_drop, (hT_d, cT_d) = model.forward(
        params, ids, h0, c0, cfg, cell_fn, dropout_key=dkey
    )
    masks = _np_masks(dkey, 0, 5, 8, cfg.hidden, drop)
    expect = np.where(masks, np.asarray(h_eval) / (1.0 - drop), 0.0)
    np.testing.assert_allclose(np.asarray(h_drop), expect, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(hT_d), np.asarray(hT_e))
    np.testing.assert_array_equal(np.asarray(cT_d), np.asarray(cT_e))


def test_tiled_masks_match_resident_bits():
    """Resident and tiled fused dropout draw IDENTICAL masks from the same
    (key, layer): the zero-pattern of the two streams is equal bit-for-bit."""
    drop = 0.4
    cfg = ModelConfig(vocab=256, hidden=256, num_layers=2, dropout=drop,
                      seed=1)
    params, ids, targets, h0, c0 = _setup(cfg, 4, 8)
    dkey = jax.random.PRNGKey(33)
    res_fn = functools.partial(pc.pallas_scan_layer)
    res_fn.fused_dropout = True
    h_res, _ = model.forward(params, ids, h0, c0, cfg, res_fn,
                             dropout_key=dkey)
    h_til, _ = model.forward(params, ids, h0, c0, cfg, _tiled_fn(),
                             dropout_key=dkey)
    np.testing.assert_array_equal(
        np.asarray(h_res) == 0.0, np.asarray(h_til) == 0.0
    )
    np.testing.assert_allclose(
        np.asarray(h_til), np.asarray(h_res), rtol=1e-5, atol=1e-6
    )


def test_tiled_masks_invariant_to_tile_width():
    """wt=128 vs wt=256 at N=256: different col_off blocking, identical
    mask bits (global element indexing)."""
    drop = 0.35
    cfg = ModelConfig(vocab=256, hidden=256, num_layers=1, dropout=drop,
                      seed=2)
    params, ids, targets, h0, c0 = _setup(cfg, 4, 8)
    dkey = jax.random.PRNGKey(5)
    h_a, _ = model.forward(params, ids, h0, c0, cfg, _tiled_fn(wt=128),
                           dropout_key=dkey)
    h_b, _ = model.forward(params, ids, h0, c0, cfg, _tiled_fn(wt=256),
                           dropout_key=dkey)
    np.testing.assert_array_equal(
        np.asarray(h_a) == 0.0, np.asarray(h_b) == 0.0
    )
    np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b), rtol=1e-6)


def test_tiled_grad_lockstep_vs_explicit_masks():
    """fp32: grads through the tiled fused-dropout kernels == grads through
    XLA with the identical masks applied explicitly."""
    drop = 0.25
    cfg = ModelConfig(vocab=256, hidden=128, num_layers=2, loss_mode="all",
                      dropout=drop, seed=3)
    s, b = 4, 8
    params, ids, targets, h0, c0 = _setup(cfg, s, b)
    dkey = jax.random.PRNGKey(17)

    loss_p, grads_p = jax.value_and_grad(
        lambda p: model.loss_fn(
            p, ids, targets, h0, c0, cfg, _tiled_fn(), dkey
        )[0]
    )(params)

    masks = [_np_masks(dkey, l, s, b, cfg.hidden, drop) for l in range(2)]
    loss_x, grads_x = jax.value_and_grad(
        lambda p: _explicit_mask_loss(
            p, ids, targets, h0, c0, cfg, dkey, masks
        )
    )(params)

    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-5)
    for (path, a), b_ in zip(
        jax.tree_util.tree_flatten_with_path(grads_p)[0],
        jax.tree_util.tree_leaves(grads_x),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5,
            err_msg=str(path),
        )


def test_tiled_embed_dropout_grad_lockstep():
    """The tiled-embed layer-0 kernel's fused dropout (fwd epilogue + shared
    tiled backward) against the explicit-mask XLA oracle, fp32."""
    drop = 0.4
    cfg = ModelConfig(vocab=256, hidden=128, num_layers=1, loss_mode="all",
                      dropout=drop, seed=5)
    s, b = 4, 8
    params, ids, targets, h0, c0 = _setup(cfg, s, b)
    dkey = jax.random.PRNGKey(13)

    cell_fn = _tiled_fn(embed=True)
    loss_p, grads_p = jax.value_and_grad(
        lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn, dkey)[0]
    )(params)

    masks = [_np_masks(dkey, 0, s, b, cfg.hidden, drop)]
    loss_x, grads_x = jax.value_and_grad(
        lambda p: _explicit_mask_loss(
            p, ids, targets, h0, c0, cfg, dkey, masks
        )
    )(params)

    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-5)
    for (path, a), b_ in zip(
        jax.tree_util.tree_flatten_with_path(grads_p)[0],
        jax.tree_util.tree_leaves(grads_x),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5,
            err_msg=str(path),
        )
