"""Core model tests: shapes, cell variants, loss modes, determinism.

Models the reference's built-in behavioral verification (SURVEY.md §4) as a
real pytest suite.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigen_lstm_tpu import ModelConfig
from eigen_lstm_tpu.models import lstm as model
from eigen_lstm_tpu.ops import cell as cell_ops


def small_cfg(**kw):
    base = dict(vocab=16, hidden=8, num_layers=1, seed=0)
    base.update(kw)
    return ModelConfig(**base)


def make_batch(cfg, s=5, b=3, seed=0):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, cfg.vocab, size=(s, b)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, size=(s, b)), jnp.int32)
    h0, c0 = model.init_state(cfg, b)
    return ids, targets, h0, c0


def test_shapes_single_layer():
    cfg = small_cfg()
    params = model.init_params(cfg)
    ids, targets, h0, c0 = make_batch(cfg)
    h_seq, (hT, cT) = model.forward(params, ids, h0, c0, cfg)
    assert h_seq.shape == (5, 3, cfg.hidden)
    assert hT.shape == (1, 3, cfg.hidden) and cT.shape == (1, 3, cfg.hidden)
    loss, ((hL, cL), bits) = model.loss_fn(params, ids, targets, h0, c0, cfg)
    assert loss.shape == () and bits.shape == ()


def test_shapes_stacked():
    cfg = small_cfg(num_layers=3)
    params = model.init_params(cfg)
    ids, targets, h0, c0 = make_batch(cfg)
    h_seq, (hT, cT) = model.forward(params, ids, h0, c0, cfg)
    assert h_seq.shape == (5, 3, cfg.hidden)
    assert hT.shape == (3, 3, cfg.hidden)


def test_initial_loss_near_uniform():
    """With tiny init, initial bits/char ~ log2(vocab) — the behavioral smoke
    the reference gets from watching its first loss prints."""
    cfg = small_cfg(vocab=16, loss_mode="all")
    params = model.init_params(cfg)
    ids, targets, h0, c0 = make_batch(cfg, s=8, b=4)
    _, (_, bits) = model.loss_fn(params, ids, targets, h0, c0, cfg)
    assert abs(float(bits) - 4.0) < 0.3  # log2(16) = 4


def test_reference_cell_carries_squashed_cell():
    """The reference destructively squashes c (root lstm.cc:189): carried cell
    must equal tanh(raw cell) and h = o * c_carried."""
    n = 4
    rng = np.random.default_rng(1)
    g_pre = jnp.asarray(rng.normal(size=(2, 4 * n)), jnp.float32)
    c_prev = jnp.asarray(rng.normal(size=(2, n)), jnp.float32)
    h, c = cell_ops.cell_step(g_pre, c_prev, n, "reference")
    g = cell_ops.gate_activations(g_pre, n)
    si, so, sf, su = cell_ops.gate_slices(n)
    c_raw = g[:, si] * g[:, su] + g[:, sf] * c_prev
    np.testing.assert_allclose(c, np.tanh(c_raw), rtol=1e-6)
    np.testing.assert_allclose(h, g[:, so] * np.tanh(c_raw), rtol=1e-6)
    # standard variant carries the raw cell
    h2, c2 = cell_ops.cell_step(g_pre, c_prev, n, "standard")
    np.testing.assert_allclose(c2, c_raw, rtol=1e-6)
    np.testing.assert_allclose(h2, g[:, so] * np.tanh(c_raw), rtol=1e-6)


def test_forget_bias_init():
    cfg = small_cfg(forget_bias=1.0)
    params = model.init_params(cfg)
    _, _, sf, _ = cell_ops.gate_slices(cfg.hidden)
    b = np.asarray(params.layers[0].b)
    assert np.all(b[sf] == 1.0)
    other = np.concatenate([b[: 2 * cfg.hidden], b[3 * cfg.hidden :]])
    assert np.all(other == 0.0)


def test_loss_mode_last_vs_all_differ():
    cfg_last = small_cfg(loss_mode="last")
    cfg_all = small_cfg(loss_mode="all")
    params = model.init_params(cfg_last)
    ids, targets, h0, c0 = make_batch(cfg_last)
    l1, _ = model.loss_fn(params, ids, targets, h0, c0, cfg_last)
    l2, _ = model.loss_fn(params, ids, targets, h0, c0, cfg_all)
    assert not np.isclose(float(l1), float(l2))


def test_loss_base_scaling():
    """ln-objective = bits-objective * ln2 (SURVEY.md §2.2 item 7)."""
    cfg_e = small_cfg(loss_base="e")
    cfg_2 = small_cfg(loss_base="2")
    params = model.init_params(cfg_e)
    ids, targets, h0, c0 = make_batch(cfg_e)
    le, _ = model.loss_fn(params, ids, targets, h0, c0, cfg_e)
    l2, _ = model.loss_fn(params, ids, targets, h0, c0, cfg_2)
    np.testing.assert_allclose(float(le), float(l2) * model.LN2, rtol=1e-6)


def test_seeded_init_reproducible():
    """Unlike the reference's random_device-seeded RNG (root lstm.cc:370-371),
    init is deterministic for a fixed seed."""
    cfg = small_cfg(seed=42)
    p1 = model.init_params(cfg)
    p2 = model.init_params(cfg)
    np.testing.assert_array_equal(p1.layers[0].W, p2.layers[0].W)
    np.testing.assert_array_equal(p1.Why, p2.Why)


def test_forward_step_matches_scan():
    """Stepping one char at a time must equal the scanned window forward —
    the sampler/eval path shares cell math with training."""
    cfg = small_cfg(num_layers=2)
    params = model.init_params(cfg)
    ids, _, h0, c0 = make_batch(cfg, s=6, b=3)
    h_seq, (hT, cT) = model.forward(params, ids, h0, c0, cfg)
    h, c = h0, c0
    for t in range(6):
        logits, (h, c) = model.forward_step(params, ids[t], h, c, cfg)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(h), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(c), rtol=1e-5, atol=1e-6)
    # logits of the last step must also agree
    ref_logits = model.logits_from_h(params, h_seq[-1], cfg)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-6)


def test_onehot_matmul_equals_gather():
    """W·onehot(x) == row gather (root lstm.cc:169)."""
    cfg = small_cfg()
    params = model.init_params(cfg)
    ids = jnp.asarray([1, 5, 9], jnp.int32)
    oh = cell_ops.one_hot(ids, cfg.vocab)
    via_matmul = oh @ params.layers[0].W
    via_gather = params.layers[0].W[ids]
    np.testing.assert_allclose(np.asarray(via_matmul), np.asarray(via_gather), rtol=1e-6)


def test_embedding_modes_agree():
    """gather vs one-hot GEMM layer-0 paths produce identical forward/grads."""
    cfg_g = small_cfg(embedding_mode="gather")
    cfg_o = small_cfg(embedding_mode="onehot")
    params = model.init_params(cfg_g)
    ids, targets, h0, c0 = make_batch(cfg_g)
    lg, _ = model.loss_fn(params, ids, targets, h0, c0, cfg_g)
    lo, _ = model.loss_fn(params, ids, targets, h0, c0, cfg_o)
    np.testing.assert_allclose(float(lg), float(lo), rtol=1e-6)
    gg = jax.grad(lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg_g)[0])(params)
    go = jax.grad(lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg_o)[0])(params)
    for a, b in zip(jax.tree_util.tree_leaves(gg), jax.tree_util.tree_leaves(go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_embedding_auto_matches_gather_and_onehot():
    """auto (gather fwd + one-hot-GEMM bwd custom VJP) must equal both."""
    cfgs = {m: small_cfg(embedding_mode=m) for m in ("auto", "gather", "onehot")}
    params = model.init_params(cfgs["auto"])
    ids, targets, h0, c0 = make_batch(cfgs["auto"])
    losses = {}
    grads = {}
    for m, cfg in cfgs.items():
        losses[m] = float(model.loss_fn(params, ids, targets, h0, c0, cfg)[0])
        grads[m] = jax.tree_util.tree_leaves(
            jax.grad(lambda p: model.loss_fn(p, ids, targets, h0, c0, cfg)[0])(params)
        )
    np.testing.assert_allclose(losses["auto"], losses["gather"], rtol=1e-6)
    np.testing.assert_allclose(losses["auto"], losses["onehot"], rtol=1e-6)
    for a, b in zip(grads["auto"], grads["gather"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_scan_chunk_remat_parity():
    """scan_chunk residual tiling: identical loss AND gradients to the
    unchunked scan (same math, recompute-only), for both the XLA scan and
    the interpret-mode Pallas kernel, incl. the fused-embed layer-0 path."""
    import dataclasses
    import functools

    from eigen_lstm_tpu.ops import pallas_cell as pc

    cfg0 = ModelConfig(hidden=128, num_layers=2, loss_mode="all", seed=0)
    cfg_c = dataclasses.replace(cfg0, scan_chunk=4)
    rng = np.random.default_rng(3)
    s, b = 12, 8
    ids = jnp.asarray(rng.integers(0, 256, (s, b)), jnp.int32)
    tg = jnp.asarray(rng.integers(0, 256, (s, b)), jnp.int32)
    params = model.init_params(cfg0)
    h0, c0 = model.init_state(cfg0, b)

    pallas_fn = functools.partial(pc.pallas_scan_layer)
    pallas_fn.embed_layer0 = pc.pallas_embed_layer0
    for cell_fn, tol in ((None, 1e-6), (pallas_fn, 1e-6)):
        outs = {}
        for name, cfg in (("flat", cfg0), ("chunked", cfg_c)):
            loss, grads = jax.value_and_grad(
                lambda p: model.loss_fn(p, ids, tg, h0, c0, cfg, cell_fn)[0]
            )(params)
            outs[name] = (float(loss), grads)
        np.testing.assert_allclose(outs["flat"][0], outs["chunked"][0],
                                   rtol=tol)
        for a, b2 in zip(
            jax.tree_util.tree_leaves(outs["flat"][1]),
            jax.tree_util.tree_leaves(outs["chunked"][1]),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       rtol=1e-5, atol=1e-6)

    # non-divisible chunk silently disables (static shape guard)
    cfg_bad = dataclasses.replace(cfg0, scan_chunk=5)
    l_bad = float(model.loss_fn(params, ids, tg, h0, c0, cfg_bad)[0])
    l_ref = float(model.loss_fn(params, ids, tg, h0, c0, cfg0)[0])
    np.testing.assert_allclose(l_bad, l_ref, rtol=1e-6)


def test_tied_embeddings_shapes_and_sharing():
    """tie_embeddings: layer-0 projection is (N, 4N); the Why gradient picks
    up BOTH the head cotangent and the embedding cotangent (it must differ
    from an untied twin whose head sees the identical forward)."""
    cfg = ModelConfig(
        vocab=16, hidden=8, num_layers=1, loss_mode="all", seed=0,
        tie_embeddings=True,
    )
    params = model.init_params(cfg)
    assert params.layers[0].W.shape == (8, 32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab, (5, 3)), jnp.int32)
    tg = jnp.asarray(rng.integers(0, cfg.vocab, (5, 3)), jnp.int32)
    h0, c0 = model.init_state(cfg, 3)
    g = jax.grad(lambda p: model.loss_fn(p, ids, tg, h0, c0, cfg)[0])(params)

    # head-only Why gradient: freeze the embedding side by substituting the
    # tied W_eff as a constant, then differentiate wrt Why through the head
    w_eff = model._substitute_tied_embed(params, cfg).layers[0].W
    cfg_untied = dataclasses.replace(cfg, tie_embeddings=False)
    p_untied = dataclasses.replace(
        params,
        layers=(dataclasses.replace(params.layers[0], W=w_eff),),
    )
    g_head = jax.grad(
        lambda why: model.loss_fn(
            dataclasses.replace(p_untied, Why=why), ids, tg, h0, c0,
            cfg_untied,
        )[0]
    )(params.Why)
    # forwards identical...
    l_tied = float(model.loss_fn(params, ids, tg, h0, c0, cfg)[0])
    l_untied = float(model.loss_fn(p_untied, ids, tg, h0, c0, cfg_untied)[0])
    np.testing.assert_allclose(l_tied, l_untied, rtol=1e-6)
    # ...but the tied Why gradient carries the extra embedding term
    diff = float(jnp.max(jnp.abs(g.Why - g_head)))
    assert diff > 1e-7, "tied Why gradient missing the embedding cotangent"


def test_tied_embeddings_trains_and_samples():
    """A tied model learns (bpc falls) through the full Trainer and the
    sampler consumes its checkpointed params (the CLI user path)."""
    from eigen_lstm_tpu import DataConfig, TrainConfig
    from eigen_lstm_tpu.data import corpus as corpus_mod
    from eigen_lstm_tpu.models import sampler as smod
    from eigen_lstm_tpu.train.trainer import Trainer

    data = np.tile(np.arange(65, 91, dtype=np.uint8), 300)
    train, test = corpus_mod.split(data, 0.9)
    mcfg = ModelConfig(
        hidden=32, num_layers=1, loss_mode="all", seed=1, tie_embeddings=True
    )
    dcfg = DataConfig(batch=8, seq=16, train_percent=0.9)
    tcfg = TrainConfig(lr=0.1, superstep=10, steps=200, eval_every_s=1e9)
    tr = Trainer(mcfg, dcfg, tcfg, train, test)
    tr.state, m0 = tr.superstep(tr.state)
    first = float(m0["bits_mean"])
    tr.run(quiet=True)
    assert tr.last_metrics["train_bpc"] < first - 2.0
    ids, _ = smod.sample_ids(
        tr.canonical_params(), mcfg, jax.random.PRNGKey(0),
        jnp.full((4,), 65, jnp.int32), *model.init_state(mcfg, 4),
        20, temperature=0.0,
    )
    assert ids.shape == (20, 4)


def test_tied_embeddings_parallel_modes():
    """tie_embeddings trains under DP, TP (sharded substitution,
    parallel/tp.py) and SP (routes through model.forward) with trajectories
    matching the single-device tied model; PP is refused (the head and the
    embedding live on different stages)."""
    from eigen_lstm_tpu import DataConfig, TrainConfig
    from eigen_lstm_tpu.parallel.mesh import make_mesh
    from eigen_lstm_tpu.train.trainer import Trainer

    data = np.tile(np.arange(65, 91, dtype=np.uint8), 300)
    mcfg = ModelConfig(
        hidden=16, num_layers=1, loss_mode="all", seed=1, tie_embeddings=True
    )
    dcfg = DataConfig(batch=8, seq=8, train_percent=1.0)
    tcfg = TrainConfig(lr=0.1, superstep=2, steps=6, eval_every_s=1e9, seed=7)

    single = Trainer(mcfg, dcfg, tcfg, data, None)
    single.run(quiet=True)
    ref = jax.tree_util.tree_leaves(single.canonical_params())

    for mode, mesh in (
        ("dp", make_mesh(4)),
        ("tp", make_mesh(4, axis="model")),
        ("sp", make_mesh(4, axis="seq")),
    ):
        tr = Trainer(mcfg, dcfg, tcfg, data, None, mesh=mesh, parallel=mode)
        tr.run(quiet=True)
        for a, b in zip(ref, jax.tree_util.tree_leaves(tr.canonical_params())):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-5, atol=1e-5, err_msg=mode,
            )

    mcfg2 = dataclasses.replace(mcfg, num_layers=2)
    with pytest.raises(ValueError, match="tie_embeddings"):
        Trainer(mcfg2, dcfg, tcfg, data, None,
                mesh=make_mesh(2, axis="stage"), parallel="pp")
