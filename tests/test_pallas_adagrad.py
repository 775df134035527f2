"""Fused Pallas Adagrad vs the jnp optimizer — backend cross-validation in
the reference's lockstep style (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from eigen_lstm_tpu import ModelConfig
from eigen_lstm_tpu.models import init_params
from eigen_lstm_tpu.ops.pallas_adagrad import adagrad_update_fused
from eigen_lstm_tpu.train.optimizer import adagrad_init, adagrad_update


def test_fused_matches_jnp_on_model_pytree():
    cfg = ModelConfig(vocab=256, hidden=128, num_layers=2, seed=0)
    params = init_params(cfg)
    key = jax.random.PRNGKey(1)
    grads = jax.tree_util.tree_map(
        lambda p: jax.random.normal(key, p.shape, p.dtype) * 0.1, params
    )
    m = jax.tree_util.tree_map(
        lambda p: jnp.abs(jax.random.normal(key, p.shape, p.dtype)) * 0.01, params
    )
    p_ref, m_ref = adagrad_update(params, grads, m, jnp.float32(0.1), 1e-10)
    p_fus, m_fus = adagrad_update_fused(params, grads, m, jnp.float32(0.1), 1e-10)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(p_ref)[0],
        jax.tree_util.tree_leaves(p_fus),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-7,
            err_msg=f"params mismatch at {jax.tree_util.keystr(path)}",
        )
    for a, b in zip(jax.tree_util.tree_leaves(m_ref), jax.tree_util.tree_leaves(m_fus)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-7)


def test_fused_repeated_steps_stay_consistent():
    """Multiple fused steps track the jnp path (accumulator state carries)."""
    cfg = ModelConfig(vocab=64, hidden=128, num_layers=1, seed=2)
    params_a = init_params(cfg)
    params_b = init_params(cfg)
    m_a = adagrad_init(params_a)
    m_b = adagrad_init(params_b)
    for step in range(5):
        key = jax.random.PRNGKey(step)
        grads = jax.tree_util.tree_map(
            lambda p: jax.random.normal(key, p.shape, p.dtype) * 0.05, params_a
        )
        params_a, m_a = adagrad_update(params_a, grads, m_a, jnp.float32(0.1))
        params_b, m_b = adagrad_update_fused(params_b, grads, m_b, jnp.float32(0.1))
    for a, b in zip(
        jax.tree_util.tree_leaves(params_a), jax.tree_util.tree_leaves(params_b)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6)
