"""Pallas fused-cell parity vs the jnp oracle — the rebuild's analogue of the
reference's Eigen/CUDA lockstep cross-validation
(lstm_eigen_CUDA/lstm.cu:425-496). Runs in interpreter mode on CPU; the same
code path compiles on real TPU (exercised by bench + TPU drives).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigen_lstm_tpu import ModelConfig
from eigen_lstm_tpu.models import lstm as model
from eigen_lstm_tpu.ops.pallas_cell import pallas_scan_layer

S, B, N = 12, 8, 128   # N multiple of 128 (lane width), B multiple of 8


def setup(variant="reference", num_layers=1, seed=0):
    cfg = ModelConfig(
        vocab=64, hidden=N, num_layers=num_layers, cell_variant=variant,
        loss_mode="all", seed=seed,
    )
    params = model.init_params(cfg)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (S, B)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (S, B)), jnp.int32)
    h0 = jnp.asarray(rng.normal(size=(num_layers, B, N)) * 0.1, jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(num_layers, B, N)) * 0.1, jnp.float32)
    return cfg, params, ids, targets, h0, c0


@pytest.mark.parametrize("variant", ["reference", "standard"])
def test_forward_parity(variant):
    cfg, params, ids, targets, h0, c0 = setup(variant)
    h_ref, (hT_ref, cT_ref) = model.forward(params, ids, h0, c0, cfg)
    h_pal, (hT_pal, cT_pal) = model.forward(
        params, ids, h0, c0, cfg, cell_fn=pallas_scan_layer
    )
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cT_pal), np.asarray(cT_ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("variant", ["reference", "standard"])
@pytest.mark.parametrize("loss_mode", ["last", "all"])
def test_gradient_parity(variant, loss_mode):
    """Full BPTT gradients through the custom VJP must match jax.grad of the
    XLA scan for every parameter tensor and the initial state."""
    cfg, params, ids, targets, h0, c0 = setup(variant)
    cfg = ModelConfig(**{**cfg.__dict__, "loss_mode": loss_mode})

    def loss_ref(p, h0, c0):
        return model.loss_fn(p, ids, targets, h0, c0, cfg)[0]

    def loss_pal(p, h0, c0):
        return model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn=pallas_scan_layer)[0]

    l_ref = float(loss_ref(params, h0, c0))
    l_pal = float(loss_pal(params, h0, c0))
    np.testing.assert_allclose(l_pal, l_ref, rtol=1e-5)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, h0, c0)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(params, h0, c0)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_pal = jax.tree_util.tree_leaves(g_pal)
    assert len(flat_ref) == len(flat_pal)
    for (path, a), b in zip(flat_ref, flat_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_stacked_layers_parity():
    cfg, params, ids, targets, h0, c0 = setup(num_layers=2)

    def loss_pal(p):
        return model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn=pallas_scan_layer)[0]

    def loss_ref(p):
        return model.loss_fn(p, ids, targets, h0, c0, cfg)[0]

    np.testing.assert_allclose(float(loss_pal(params)), float(loss_ref(params)), rtol=1e-5)
    g_ref = jax.tree_util.tree_leaves(jax.grad(loss_ref)(params))
    g_pal = jax.tree_util.tree_leaves(jax.grad(loss_pal)(params))
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6)


def test_pallas_under_jit_and_training_step():
    """The fused kernel must compose with jit + value_and_grad + optimizer —
    one real training step reduces loss on repeated data."""
    from eigen_lstm_tpu.train import optimizer as opt_mod

    cfg, params, ids, targets, h0, c0 = setup()
    m = opt_mod.adagrad_init(params)

    @jax.jit
    def train_step(params, m):
        (loss, _), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(
            params, ids, targets, h0, c0, cfg, pallas_scan_layer
        )
        params, m = opt_mod.adagrad_update(params, grads, m, jnp.float32(0.1))
        return params, m, loss

    losses = []
    for _ in range(8):
        params, m, loss = train_step(params, m)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("residual_dtype", ["float32", "bfloat16"])
def test_bf16_compute_and_residual_parity(residual_dtype):
    """Mixed-precision kernel paths (bf16 U in VMEM, bf16 xw/dg streams,
    optional bf16 residuals) vs the fp32 oracle at bf16 tolerances."""
    cfg_ref = ModelConfig(vocab=64, hidden=N, num_layers=1, loss_mode="all", seed=0)
    cfg_bf = ModelConfig(
        vocab=64, hidden=N, num_layers=1, loss_mode="all", seed=0,
        compute_dtype="bfloat16", residual_dtype=residual_dtype,
    )
    params = model.init_params(cfg_ref)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 64, (S, B)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 64, (S, B)), jnp.int32)
    h0, c0 = model.init_state(cfg_ref, B)

    l_ref = float(model.loss_fn(params, ids, targets, h0, c0, cfg_ref)[0])
    l_bf = float(
        model.loss_fn(params, ids, targets, h0, c0, cfg_bf, cell_fn=pallas_scan_layer)[0]
    )
    assert abs(l_bf - l_ref) / abs(l_ref) < 0.01, (l_bf, l_ref)

    g_ref = jax.grad(lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg_ref)[0])(params)
    g_bf = jax.grad(
        lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg_bf, cell_fn=pallas_scan_layer)[0]
    )(params)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0], jax.tree_util.tree_leaves(g_bf)
    ):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 0.05, f"{jax.tree_util.keystr(path)}: {err}"


@pytest.mark.parametrize("variant", ["reference", "standard"])
def test_fused_embedding_layer0_parity(variant):
    """The fused-embedding kernel (onehot ++ h vs stacked [W;U], one matmul
    per step, no xw stream) must match the oracle in loss AND all grads."""
    from eigen_lstm_tpu.ops import pallas_cell as pc

    cfg = ModelConfig(
        vocab=128, hidden=N, num_layers=1, cell_variant=variant,
        loss_mode="all", seed=0,
    )
    params = model.init_params(cfg)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (S, B)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (S, B)), jnp.int32)
    h0 = jnp.asarray(rng.normal(size=(1, B, N)) * 0.1, jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(1, B, N)) * 0.1, jnp.float32)

    import functools as ft

    cell_fn = ft.partial(pc.pallas_scan_layer)
    cell_fn.embed_layer0 = pc.pallas_embed_layer0

    l_ref = float(model.loss_fn(params, ids, targets, h0, c0, cfg)[0])
    l_fus = float(model.loss_fn(params, ids, targets, h0, c0, cfg, cell_fn=cell_fn)[0])
    np.testing.assert_allclose(l_fus, l_ref, rtol=1e-5)

    g_ref = jax.grad(lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg)[0])(params)
    g_fus = jax.grad(
        lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn=cell_fn)[0]
    )(params)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0], jax.tree_util.tree_leaves(g_fus)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6,
            err_msg=f"fused-embed grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_fused_embedding_batch_split_parity():
    """n_split=2 (epilogue/MXU overlap staggering) is the same function."""
    import functools as ft

    from eigen_lstm_tpu.ops import pallas_cell as pc

    cfg = ModelConfig(vocab=128, hidden=N, num_layers=1, loss_mode="all", seed=0)
    params = model.init_params(cfg)
    rng = np.random.default_rng(6)
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (S, B)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (S, B)), jnp.int32)
    h0 = jnp.asarray(rng.normal(size=(1, B, N)) * 0.1, jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(1, B, N)) * 0.1, jnp.float32)

    def loss_with(n_split):
        cell_fn = ft.partial(pc.pallas_scan_layer)
        cell_fn.embed_layer0 = ft.partial(pc.pallas_embed_layer0, n_split=n_split)
        return jax.value_and_grad(
            lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn=cell_fn)[0]
        )(params)

    l1, g1 = loss_with(1)
    l2, g2 = loss_with(2)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)


def test_embed_bwd_bsplit_matches_unsplit(monkeypatch):
    """EIGEN_LSTM_BSPLIT_BWD=2 staggers the backward gate math into batch
    half-blocks; gradients must equal the unsplit kernel exactly (same math,
    same accumulation order per tensor)."""
    from eigen_lstm_tpu.ops import pallas_cell as pc

    cfg = ModelConfig(vocab=32, hidden=16, num_layers=1, loss_mode="all", seed=0)
    params = model.init_params(cfg)
    rng = np.random.default_rng(0)
    s, b = 6, 16
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    h0, c0 = model.init_state(cfg, b)
    import functools as ft

    cell_fn = ft.partial(pc.pallas_scan_layer)
    cell_fn.embed_layer0 = pc.pallas_embed_layer0

    def grads_with(split):
        monkeypatch.setenv("EIGEN_LSTM_BSPLIT_BWD", str(split))
        pc._make_fused_embed_seq.cache_clear()
        return jax.grad(
            lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn)[0]
        )(params)

    try:
        g1 = grads_with(1)
        g2 = grads_with(2)
        for a, b_ in zip(
            jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
        ):
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a), rtol=1e-6, atol=1e-7
            )
    finally:
        pc._make_fused_embed_seq.cache_clear()


@pytest.mark.parametrize("drop", [0.0, 0.4])
def test_embed_bwd_unroll2_matches_unroll1(monkeypatch, drop):
    """EIGEN_LSTM_BWD_UNROLL=2 processes two timesteps per grid iteration
    (backward scheduling attempt 4 — tau1's wgrad GEMMs issued between its
    dh GEMM and tau0's VPU gate backward). Same GEMMs, same per-timestep
    accumulation order: loss and every gradient must match the unroll-1
    kernel exactly, with and without fused dropout."""
    from eigen_lstm_tpu.ops import pallas_cell as pc

    cfg = ModelConfig(
        vocab=32, hidden=16, num_layers=1, loss_mode="all", seed=0,
        dropout=drop,
    )
    params = model.init_params(cfg)
    rng = np.random.default_rng(1)
    s, b = 6, 16
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    h0, c0 = model.init_state(cfg, b)
    import functools as ft

    cell_fn = ft.partial(pc.pallas_scan_layer)
    cell_fn.embed_layer0 = pc.pallas_embed_layer0
    cell_fn.fused_dropout = True
    dkey = jax.random.PRNGKey(7) if drop > 0.0 else None

    def loss_grads_with(unroll):
        monkeypatch.setenv("EIGEN_LSTM_BWD_UNROLL", str(unroll))
        pc._make_fused_embed_seq.cache_clear()
        return jax.value_and_grad(
            lambda p: model.loss_fn(
                p, ids, targets, h0, c0, cfg, cell_fn, dkey
            )[0]
        )(params)

    try:
        l1, g1 = loss_grads_with(1)
        l2, g2 = loss_grads_with(2)
        assert float(l1) == float(l2)
        for a, b_ in zip(
            jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
        ):
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a), rtol=1e-6, atol=1e-7
            )
    finally:
        pc._make_fused_embed_seq.cache_clear()


def test_embed_bwd_unroll2_odd_s_falls_back(monkeypatch):
    """Odd S cannot unroll by 2 — the knob must silently fall back to the
    unroll-1 kernel rather than miscompute or crash."""
    from eigen_lstm_tpu.ops import pallas_cell as pc

    cfg = ModelConfig(vocab=32, hidden=16, num_layers=1, loss_mode="all", seed=0)
    params = model.init_params(cfg)
    rng = np.random.default_rng(2)
    s, b = 5, 16
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    h0, c0 = model.init_state(cfg, b)
    import functools as ft

    cell_fn = ft.partial(pc.pallas_scan_layer)
    cell_fn.embed_layer0 = pc.pallas_embed_layer0

    def grads_with(unroll):
        monkeypatch.setenv("EIGEN_LSTM_BWD_UNROLL", str(unroll))
        pc._make_fused_embed_seq.cache_clear()
        return jax.grad(
            lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn)[0]
        )(params)

    try:
        g1 = grads_with(1)
        g2 = grads_with(2)
        for a, b_ in zip(
            jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
        ):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a))
    finally:
        pc._make_fused_embed_seq.cache_clear()


def test_tied_embeddings_pallas_embed_matches_xla():
    """Tied models run the fused-embed kernel unchanged (the substitution
    hands it an ordinary (M, 4N) effective weight): loss and every gradient
    must match the XLA path of the same tied model."""
    from eigen_lstm_tpu.ops import pallas_cell as pc

    cfg = ModelConfig(
        vocab=128, hidden=128, num_layers=1, loss_mode="all", seed=0,
        tie_embeddings=True,
    )
    params = model.init_params(cfg)
    rng = np.random.default_rng(3)
    s, b = 6, 16
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (s, b)), jnp.int32)
    h0, c0 = model.init_state(cfg, b)
    import functools as ft

    cell_fn = ft.partial(pc.pallas_scan_layer)
    cell_fn.embed_layer0 = pc.pallas_embed_layer0

    l_x, g_x = jax.value_and_grad(
        lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg)[0]
    )(params)
    l_p, g_p = jax.value_and_grad(
        lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg, cell_fn)[0]
    )(params)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-5)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(g_x), jax.tree_util.tree_leaves(g_p)
    ):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=2e-4, atol=1e-5
        )
