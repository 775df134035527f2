"""Tiled-U Pallas kernel parity vs the jnp oracle and the resident-U kernel
(the N >= 2048 path where U no longer fits VMEM). Interpreter mode on CPU;
the same code compiles on real TPU (exercised by bench)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigen_lstm_tpu import ModelConfig
from eigen_lstm_tpu.models import lstm as model
from eigen_lstm_tpu.ops.pallas_cell import pallas_scan_layer
from eigen_lstm_tpu.ops.pallas_cell_tiled import (
    pallas_tiled_scan_layer,
    pick_tile_width,
)

S, B, N = 6, 8, 256
WT = 128  # -> 8 tiles, 2 chunks per gate


def tiled_fn(wt=WT):
    return functools.partial(pallas_tiled_scan_layer, wt=wt)


def setup(variant="reference", seed=0, compute_dtype="float32"):
    cfg = ModelConfig(
        vocab=64, hidden=N, num_layers=1, cell_variant=variant,
        loss_mode="all", compute_dtype=compute_dtype, seed=seed,
    )
    params = model.init_params(cfg)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (S, B)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (S, B)), jnp.int32)
    h0 = jnp.asarray(rng.normal(size=(1, B, N)) * 0.1, jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(1, B, N)) * 0.1, jnp.float32)
    return cfg, params, ids, targets, h0, c0


@pytest.mark.parametrize("variant", ["reference", "standard"])
def test_tiled_forward_parity(variant):
    cfg, params, ids, targets, h0, c0 = setup(variant)
    h_ref, (hT_ref, cT_ref) = model.forward(params, ids, h0, c0, cfg)
    h_til, (hT_til, cT_til) = model.forward(
        params, ids, h0, c0, cfg, cell_fn=tiled_fn()
    )
    np.testing.assert_allclose(np.asarray(h_til), np.asarray(h_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cT_til), np.asarray(cT_ref), rtol=1e-5, atol=1e-6)


def test_tiled_matches_resident_kernel():
    """Lockstep: tiled and resident kernels on identical inputs."""
    cfg, params, ids, targets, h0, c0 = setup()
    h_a, (hT_a, cT_a) = model.forward(
        params, ids, h0, c0, cfg, cell_fn=pallas_scan_layer
    )
    h_b, (hT_b, cT_b) = model.forward(params, ids, h0, c0, cfg, cell_fn=tiled_fn())
    np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_a), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(cT_b), np.asarray(cT_a), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("variant", ["reference", "standard"])
@pytest.mark.parametrize("loss_mode", ["last", "all"])
def test_tiled_gradient_parity(variant, loss_mode):
    cfg, params, ids, targets, h0, c0 = setup(variant)
    cfg = ModelConfig(**{**cfg.__dict__, "loss_mode": loss_mode})

    def loss_ref(p, h0, c0):
        return model.loss_fn(p, ids, targets, h0, c0, cfg)[0]

    def loss_til(p, h0, c0):
        return model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn=tiled_fn())[0]

    np.testing.assert_allclose(
        float(loss_til(params, h0, c0)), float(loss_ref(params, h0, c0)), rtol=1e-5
    )
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, h0, c0)
    g_til = jax.grad(loss_til, argnums=(0, 1, 2))(params, h0, c0)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_til = jax.tree_util.tree_leaves(g_til)
    for (path, a), b in zip(flat_ref, flat_til):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6,
            err_msg=f"tiled grad mismatch at {jax.tree_util.keystr(path)}",
        )


@pytest.mark.parametrize("wt", [128, 256])
def test_tiled_tile_widths(wt):
    """Different tile widths are the same function."""
    cfg, params, ids, targets, h0, c0 = setup()

    def loss(p, fn):
        return model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn=fn)[0]

    l_ref = float(loss(params, None))
    l_til = float(loss(params, tiled_fn(wt)))
    np.testing.assert_allclose(l_til, l_ref, rtol=1e-5)


def test_tiled_bf16_training_step_sane():
    """bf16 compute + bf16 residuals through a jitted grad step (the N>=2048
    bench regime, scaled down)."""
    cfg, params, ids, targets, h0, c0 = setup(compute_dtype="bfloat16")
    cfg = ModelConfig(**{**cfg.__dict__, "residual_dtype": "bfloat16"})

    def loss_til(p):
        return model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn=tiled_fn())[0]

    def loss_ref(p):
        return model.loss_fn(p, ids, targets, h0, c0, cfg)[0]

    l_til, g_til = jax.jit(jax.value_and_grad(loss_til))(params)
    l_ref, g_ref = jax.jit(jax.value_and_grad(loss_ref))(params)
    np.testing.assert_allclose(float(l_til), float(l_ref), rtol=2e-2)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_til)):
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32),
            rtol=0.1, atol=5e-3,
        )


def test_pick_tile_width():
    # N=2048 B=128 bf16: must fit with some tile; fp32 at N=2048 B=128 must
    # be rejected (falls back to the XLA scan)
    assert pick_tile_width(2048, 128, "bfloat16", "bfloat16") > 0
    assert pick_tile_width(1024, 128, "float32", "float32") > 0
    assert pick_tile_width(2048, 128, "float32", "float32") == 0


# --------------------- tiled-embed layer-0 variant ---------------------

from eigen_lstm_tpu.ops.pallas_cell_tiled import (  # noqa: E402
    pallas_tiled_embed_layer0,
    pick_tile_width_embed,
)


def embed_fn(wt=WT):
    base = tiled_fn(wt)
    base.embed_layer0 = functools.partial(pallas_tiled_embed_layer0, wt=wt)
    return base


@pytest.mark.parametrize("variant", ["reference", "standard"])
def test_tiled_embed_forward_parity(variant):
    cfg, params, ids, targets, h0, c0 = setup(variant)
    h_ref, (hT_ref, cT_ref) = model.forward(params, ids, h0, c0, cfg)
    h_e, (hT_e, cT_e) = model.forward(
        params, ids, h0, c0, cfg, cell_fn=embed_fn()
    )
    np.testing.assert_allclose(np.asarray(h_e), np.asarray(h_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cT_e), np.asarray(cT_ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("loss_mode", ["last", "all"])
def test_tiled_embed_gradient_parity(loss_mode):
    cfg, params, ids, targets, h0, c0 = setup()
    cfg = ModelConfig(**{**cfg.__dict__, "loss_mode": loss_mode})

    def loss_ref(p, h0, c0):
        return model.loss_fn(p, ids, targets, h0, c0, cfg)[0]

    def loss_e(p, h0, c0):
        return model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn=embed_fn())[0]

    np.testing.assert_allclose(
        float(loss_e(params, h0, c0)), float(loss_ref(params, h0, c0)), rtol=1e-5
    )
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, h0, c0)
    g_e = jax.grad(loss_e, argnums=(0, 1, 2))(params, h0, c0)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_e = jax.tree_util.tree_leaves(g_e)
    for (path, a), b in zip(flat_ref, flat_e):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6,
            err_msg=f"tiled-embed grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_tiled_embed_stacked_layers():
    """L0 uses the embed kernel, upper layers the xw tiled kernel."""
    cfg, params, ids, targets, h0, c0 = setup()
    cfg = ModelConfig(**{**cfg.__dict__, "num_layers": 2})
    params = model.init_params(cfg)
    rng = np.random.default_rng(1)
    h0 = jnp.asarray(rng.normal(size=(2, B, N)) * 0.1, jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(2, B, N)) * 0.1, jnp.float32)

    def loss(p, fn):
        return model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn=fn)[0]

    l_ref = float(loss(params, None))
    l_e = float(loss(params, embed_fn()))
    np.testing.assert_allclose(l_e, l_ref, rtol=1e-5)
    g_ref = jax.grad(lambda p: loss(p, None))(params)
    g_e = jax.grad(lambda p: loss(p, embed_fn()))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_e)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6
        )


def test_pick_tile_width_embed():
    assert pick_tile_width_embed(2048, 256, 128, "bfloat16", "bfloat16") > 0
    assert pick_tile_width_embed(2048, 256, 128, "float32", "float32") == 0
