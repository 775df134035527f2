"""Fused softmax-CE head kernel parity vs the jnp head (interpret mode):
value and all three cotangents (dh, dWhy, dby), plus the loss_fn wiring."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigen_lstm_tpu import ModelConfig
from eigen_lstm_tpu.models import lstm as model
from eigen_lstm_tpu.ops import pallas_head as ph


def setup(t=96, n=128, m=256, seed=0, compute_dtype="float32"):
    cfg = ModelConfig(vocab=m, hidden=n, num_layers=1, loss_mode="all",
                      compute_dtype=compute_dtype, seed=seed)
    params = model.init_params(cfg)
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(t, n)) * 0.5, jnp.float32)
    tgt = jnp.asarray(rng.integers(0, m, (t,)), jnp.int32)
    return cfg, params, h, tgt


def ref_bits_sum(params, h, tgt, cfg):
    logits = model.logits_from_h(params, h, cfg)
    return jnp.sum(model.softmax_xent_bits(logits, tgt))


def test_head_value_parity():
    cfg, params, h, tgt = setup()
    got = float(ph.fused_head_bits(params, h, tgt, cfg))
    want = float(ref_bits_sum(params, h, tgt, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_head_gradient_parity():
    cfg, params, h, tgt = setup()

    def f_fused(p, h):
        return ph.fused_head_bits(p, h, tgt, cfg) * 0.37  # nontrivial cot

    def f_ref(p, h):
        return ref_bits_sum(p, h, tgt, cfg) * 0.37

    (gp_f, gh_f) = jax.grad(f_fused, argnums=(0, 1))(params, h)
    (gp_r, gh_r) = jax.grad(f_ref, argnums=(0, 1))(params, h)
    np.testing.assert_allclose(
        np.asarray(gh_f), np.asarray(gh_r), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gp_f.Why), np.asarray(gp_r.Why), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gp_f.by), np.asarray(gp_r.by), rtol=1e-4, atol=1e-6
    )
    # the recurrence params get no contribution from the head itself
    for a in jax.tree_util.tree_leaves(gp_f.layers):
        assert float(jnp.max(jnp.abs(a))) == 0.0


def test_head_chunked_matches_single_chunk():
    cfg, params, h, tgt = setup(t=96)
    # force multi-chunk by monkeypatching the chunk choice
    got_multi = float(
        ph._make_head(96, 128, 256, 24, "float32", True)(
            params.Why.astype(jnp.float32), params.by.astype(jnp.float32).reshape(1, -1),
            h, tgt.reshape(96, 1),
        )
    )
    want = float(ref_bits_sum(params, h, tgt, cfg))
    np.testing.assert_allclose(got_multi, want, rtol=1e-5)


def test_loss_fn_uses_fused_head_and_matches():
    """End-to-end: loss_fn with a cell_fn exposing fused_head must equal the
    plain path in loss and grads."""
    cfg, params, h, tgt = setup()
    rng = np.random.default_rng(3)
    s, b = 12, 8
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    h0, c0 = model.init_state(cfg, b)

    cell_fn = functools.partial(lambda layer, xw, h0, c0, cfg: model._scan_layer(layer, xw, h0, c0, cfg))
    head = functools.partial(ph.fused_head_bits)
    head.supported = ph.head_supported
    cell_fn.fused_head = head

    l_ref, g_ref = jax.value_and_grad(
        lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg)[0]
    )(params)
    l_fus, g_fus = jax.value_and_grad(
        lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn=cell_fn)[0]
    )(params)
    np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fus)):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=1e-4, atol=1e-6
        )


def test_head_supported_gate():
    cfg = ModelConfig(hidden=512, vocab=256, compute_dtype="bfloat16")
    assert ph.head_supported(cfg, 12800)
    assert not ph.head_supported(ModelConfig(hidden=100), 12800)
    assert not ph.head_supported(cfg, 12801)  # t not multiple of 8
