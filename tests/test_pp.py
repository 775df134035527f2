"""Pipeline-parallel (stage-per-layer) tests: the pipelined schedule must be
bit-for-bit the single-device stacked model (same recurrence, same loss)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigen_lstm_tpu import ModelConfig
from eigen_lstm_tpu.models import lstm as model
from eigen_lstm_tpu.parallel import mesh as mesh_mod
from eigen_lstm_tpu.parallel import pp as pp_mod


def setup(num_layers, hidden=16, s=8, b=4, seed=0):
    cfg = ModelConfig(
        vocab=32, hidden=hidden, num_layers=num_layers, loss_mode="all", seed=seed
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


@pytest.mark.parametrize("num_layers,n_chunks", [(2, 4), (4, 2), (8, 4)])
def test_pp_matches_single_device(num_layers, n_chunks):
    cfg, params, ids, targets, h0, c0 = setup(num_layers)
    mesh = mesh_mod.make_mesh(num_layers, axis="stage")
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
    with pytest.raises(ValueError, match="one stage per layer"):
        pp_mod.make_pp_loss_and_grad(cfg, mesh, 2)
