"""Training-loop tests: superstep convergence, warmup, clipping, checkpoint
round-trip, evaluator, sampler. The reference's behavioral smoke (loss
decreasing, eval error reported — SURVEY.md §4.4) as real assertions.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigen_lstm_tpu import DataConfig, ModelConfig, TrainConfig
from eigen_lstm_tpu.data import corpus as corpus_mod
from eigen_lstm_tpu.models import init_params, init_state
from eigen_lstm_tpu.models import sampler as sampler_mod
from eigen_lstm_tpu.train import checkpoint as ckpt_mod
from eigen_lstm_tpu.train import evaluator as eval_mod
from eigen_lstm_tpu.train import metrics as metrics_mod
from eigen_lstm_tpu.train import optimizer as opt_mod
from eigen_lstm_tpu.train.trainer import Trainer


def synthetic_corpus(n=20000, period=17, seed=0):
    """Highly learnable periodic byte pattern + noise."""
    rng = np.random.default_rng(seed)
    base = np.tile(np.arange(period, dtype=np.uint8) + 65, n // period + 1)[:n]
    noise = rng.integers(0, 256, n).astype(np.uint8)
    mask = rng.random(n) < 0.02
    return np.where(mask, noise, base).astype(np.uint8)


def make_trainer(**kw):
    mcfg = kw.pop("mcfg", ModelConfig(hidden=32, num_layers=1, loss_mode="all", seed=0))
    dcfg = kw.pop("dcfg", DataConfig(batch=8, seq=16, train_percent=0.9))
    tcfg = kw.pop("tcfg", TrainConfig(lr=0.1, superstep=10, steps=100, eval_every_s=1e9))
    data = kw.pop("data", synthetic_corpus())
    train, test = corpus_mod.split(data, dcfg.train_percent)
    return Trainer(mcfg, dcfg, tcfg, train, test, **kw)


def test_training_reduces_loss():
    tr = make_trainer()
    tr.state, m0 = tr.superstep(tr.state)
    first = float(m0["bits_mean"])
    tr.run(steps=200, quiet=True)
    last = tr.last_metrics["train_bpc"]
    assert last < first - 2.0, f"no learning: {first} -> {last}"
    assert last < 2.0  # periodic pattern is near-deterministic


def test_eval_bpc_sane_and_improves():
    tr = make_trainer()
    before = tr.evaluate()
    tr.run(steps=300, quiet=True)
    after = tr.evaluate()
    assert after < before - 2.0
    # single-stream (reference-parity) eval agrees with batched within noise
    single = eval_mod.evaluate_bpc(
        tr.state.params, tr.test_np, tr.mcfg, eval_batch=1, chunk=64
    )
    assert abs(single - after) < 0.5


def test_eval_scores_every_byte():
    """The evaluator must score every byte of the split exactly once — the
    reference test() walks the full held-out set (class_CUDA/lstm.cc:661-720).
    Awkward length so ceil-span streams + chunk padding + tail mask are all
    exercised; compared against an unpadded per-stream forward."""
    from eigen_lstm_tpu.models import lstm as model_mod

    cfg = ModelConfig(hidden=16, num_layers=1, seed=3)
    params = init_params(cfg)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 1003).astype(np.uint8)
    eval_batch = 4
    got = eval_mod.evaluate_bpc(params, data, cfg, eval_batch=eval_batch, chunk=16)

    usable = len(data) - 1
    span = -(-usable // eval_batch)
    total = 0.0
    for e in range(eval_batch):
        s = e * span
        n = min(span, usable - s)
        x = jnp.asarray(data[s : s + n].astype(np.int32))[:, None]
        t = jnp.asarray(data[s + 1 : s + 1 + n].astype(np.int32))[:, None]
        h, c = init_state(cfg, 1)
        h_seq, _ = model_mod.forward(params, x, h, c, cfg)
        logits = model_mod.logits_from_h(params, h_seq, cfg)
        total += float(jnp.sum(model_mod.softmax_xent_bits(logits, t)))
    np.testing.assert_allclose(got, total / usable, rtol=1e-5)


def test_warmup_freezes_params():
    """lr=0 during warmup (class_CUDA lstm.cc:364-367): params unchanged,
    but Adagrad accumulators still accumulate."""
    tcfg = TrainConfig(lr=0.1, superstep=5, warmup_steps=1000, eval_every_s=1e9)
    tr = make_trainer(tcfg=tcfg)
    p0 = np.asarray(tr.state.params.Why).copy()
    m0 = np.asarray(tr.state.m.Why).copy()
    tr.run(steps=10, quiet=True)
    np.testing.assert_array_equal(np.asarray(tr.state.params.Why), p0)
    assert np.any(np.asarray(tr.state.m.Why) != m0)


def test_default_recipe_converges_on_enwik5():
    """Convergence regression (VERDICT r1): the CLI's resolved defaults must
    actually train — bpc drops well below the ~4.85 stall seen at bad lr
    within a short budget on a real corpus slice."""
    data = np.fromfile("data/enwik5.txt", dtype=np.uint8)
    mcfg = ModelConfig(hidden=64, num_layers=1, loss_mode="all", seed=0)
    dcfg = DataConfig(batch=16, seq=25, train_percent=0.95)
    # mirror cli._configs resolution: hidden<512 -> lr 0.1; warmup capped
    tcfg = TrainConfig(
        lr=0.1, warmup_steps=min(50 * 25, 400 // 10), superstep=20,
        eval_every_s=1e9,
    )
    train, test = corpus_mod.split(data, dcfg.train_percent)
    tr = Trainer(mcfg, dcfg, tcfg, train, test)
    tr.run(steps=400, quiet=True)
    assert tr.last_metrics["train_bpc"] < 3.6, tr.last_metrics


def test_nonfinite_step_preserves_recurrent_state():
    """A non-finite loss must be a full no-op: grads zeroed AND the streams'
    h/c kept at their pre-step values, so one bad step can't poison every
    stream until it wraps (ADVICE r1). Forced by poisoning the head weights."""
    import dataclasses

    tcfg = TrainConfig(lr=0.1, superstep=1, warmup_steps=0, eval_every_s=1e9)
    tr = make_trainer(tcfg=tcfg)
    # establish a nonzero recurrent state first
    tr.state, _ = tr.superstep(tr.state)
    h_before = np.asarray(tr.state.h).copy()
    c_before = np.asarray(tr.state.c).copy()
    w_before = np.asarray(tr.state.params.layers[0].W).copy()
    poisoned = dataclasses.replace(
        tr.state,
        params=dataclasses.replace(
            tr.state.params, Why=tr.state.params.Why * jnp.nan
        ),
    )
    new_state, metrics = tr.superstep(poisoned)
    assert not np.isfinite(float(metrics["bits_mean"]))
    np.testing.assert_array_equal(np.asarray(new_state.h), h_before)
    np.testing.assert_array_equal(np.asarray(new_state.c), c_before)
    # the update itself was skipped (W untouched by NaN grads)
    np.testing.assert_array_equal(
        np.asarray(new_state.params.layers[0].W), w_before
    )


def test_crosscheck_lockstep():
    """Runtime pallas-vs-xla lockstep (reference lstm.cu:425-496): agreement
    for the real kernel (interpret mode on CPU), mismatch detected for a
    deliberately wrong backend."""
    from eigen_lstm_tpu.ops.pallas_cell import pallas_scan_layer

    mcfg = ModelConfig(hidden=128, num_layers=1, loss_mode="all", seed=0)
    tr = make_trainer(
        mcfg=mcfg,
        dcfg=DataConfig(batch=8, seq=16, train_percent=0.9),
        cell_fn=pallas_scan_layer,
    )
    res = tr.crosscheck(quiet=True)
    assert res["ok"], res
    assert tr.crosscheck_failures == 0

    def broken_cell(layer, xw, h0, c0, cfg):
        return pallas_scan_layer(layer, xw * 1.01, h0, c0, cfg)

    tr.cell_fn = broken_cell
    res = tr.crosscheck(tol=1e-5, quiet=True)
    assert not res["ok"]
    assert tr.crosscheck_failures == 1


def test_grad_clipping_bounds_norm():
    grads = {"a": jnp.full((10,), 100.0), "b": jnp.full((5,), -50.0)}
    clipped, gnorm = opt_mod.clip_by_global_norm(grads, 1.0)
    total = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in clipped.values()))
    assert float(total) <= 1.0 + 1e-5
    assert float(gnorm) > 1.0


def test_superstep_metrics_report_gnorm_spike_detector():
    """Every superstep reports ``gnorm_max`` >= ``gnorm_mean``: the
    single-batch spike detector added after an unclipped gradient spike
    poisoned the round-5 flagship's Adagrad state between two evals
    (NORTHSTAR.md round-5 incident note). The reference logs only loss, so
    the event class is invisible there; here it is a first-class metric in
    every parallel mode (the shard_map out_specs carry it too)."""
    tr = make_trainer()
    tr.state, metrics = tr.superstep(tr.state)
    assert "gnorm_max" in metrics and "gnorm_mean" in metrics
    gmax, gmean = float(metrics["gnorm_max"]), float(metrics["gnorm_mean"])
    assert np.isfinite(gmax) and gmax >= gmean > 0.0
    # the run loop surfaces the window max in last_metrics
    tr.run(steps=10, quiet=True)
    assert np.isfinite(tr.last_metrics["gnorm_max"])


def test_adagrad_matches_manual():
    """Elementwise check of the update rule m += g^2; p -= lr*g/sqrt(m+eps)
    (root lstm.cc:261-272)."""
    p = {"w": jnp.asarray([1.0, -2.0, 3.0])}
    g = {"w": jnp.asarray([0.5, 0.1, -0.2])}
    m = {"w": jnp.asarray([0.1, 0.0, 1.0])}
    lr, eps = 0.1, 1e-10
    p2, m2 = opt_mod.adagrad_update(p, g, m, jnp.float32(lr), eps)
    m_exp = np.asarray(m["w"]) + np.asarray(g["w"]) ** 2
    p_exp = np.asarray(p["w"]) - lr * np.asarray(g["w"]) / np.sqrt(m_exp + eps)
    np.testing.assert_allclose(np.asarray(m2["w"]), m_exp, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p2["w"]), p_exp, rtol=1e-6)


def test_kill_resume_trajectory_bit_identical(tmp_path):
    """A kill/resume is a no-op on the training trajectory: 40 uninterrupted
    steps vs 20 steps -> save -> fresh process -> restore -> 20 steps land on
    bit-identical params, Adagrad state, cursors, and RNG key. The checkpoint
    carries the full state (params + m + cursors + stream h/c + rng_key,
    trainer.save), which the reference loses across restarts — its final
    driver reloads weights only (class_CUDA/lstm.cc:154,188-238). Dropout is
    on so the restored rng_key/step also drive the mask streams identically."""
    mcfg = ModelConfig(hidden=32, num_layers=2, loss_mode="all", seed=0,
                       dropout=0.25)
    control = make_trainer(mcfg=mcfg)
    control.run(steps=40, quiet=True)

    tr = make_trainer(mcfg=mcfg)
    tr.run(steps=20, quiet=True)
    path = str(tmp_path / "ck.npz")
    tr.save(path)
    resumed = make_trainer(mcfg=mcfg)      # fresh init, as after a kill
    resumed.restore(path)
    resumed.run(steps=20, quiet=True)

    assert resumed.step == control.step
    for name in ("Why", "by"):
        np.testing.assert_array_equal(
            np.asarray(getattr(resumed.state.params, name)),
            np.asarray(getattr(control.state.params, name)), err_msg=name)
    for l in range(mcfg.num_layers):
        for name in ("W", "U", "b"):
            np.testing.assert_array_equal(
                np.asarray(getattr(resumed.state.params.layers[l], name)),
                np.asarray(getattr(control.state.params.layers[l], name)),
                err_msg=f"layers[{l}].{name}")
            np.testing.assert_array_equal(
                np.asarray(getattr(resumed.state.m.layers[l], name)),
                np.asarray(getattr(control.state.m.layers[l], name)),
                err_msg=f"m.layers[{l}].{name}")
    np.testing.assert_array_equal(np.asarray(resumed.state.positions),
                                  np.asarray(control.state.positions))
    np.testing.assert_array_equal(np.asarray(resumed.state.key),
                                  np.asarray(control.state.key))
    np.testing.assert_array_equal(np.asarray(resumed.state.h),
                                  np.asarray(control.state.h))


def test_checkpoint_roundtrip(tmp_path):
    tr = make_trainer()
    tr.run(steps=20, quiet=True)
    path = str(tmp_path / "ck.npz")
    tr.save(path)
    tr2 = make_trainer()
    assert not np.allclose(np.asarray(tr2.state.params.Why), np.asarray(tr.state.params.Why))
    tr2.restore(path)
    np.testing.assert_array_equal(
        np.asarray(tr2.state.params.Why), np.asarray(tr.state.params.Why)
    )
    np.testing.assert_array_equal(
        np.asarray(tr2.state.m.layers[0].W), np.asarray(tr.state.m.layers[0].W)
    )
    np.testing.assert_array_equal(
        np.asarray(tr2.state.positions), np.asarray(tr.state.positions)
    )
    assert tr2.step == tr.step
    # resumed training continues without blowup
    tr2.run(steps=20, quiet=True)
    assert np.isfinite(tr2.last_metrics["train_bpc"])


def test_best_checkpoint_retained(tmp_path, monkeypatch):
    """ckpt_best.npz tracks the best held-out eval and survives both later
    worse evals (training spikes) and resumed runs (best seeded from the
    file's metadata, so a post-restart eval can't clobber it)."""
    import eigen_lstm_tpu.train.evaluator as eval_mod

    tcfg = TrainConfig(lr=0.1, superstep=10, steps=100, eval_every_s=1e9,
                       checkpoint_dir=str(tmp_path), sample_chars=0)
    tr = make_trainer(tcfg=tcfg)
    tr.run(steps=10, quiet=True)

    fake = {"v": 3.0}
    monkeypatch.setattr(eval_mod, "evaluate_bpc",
                        lambda *a, **k: fake["v"])
    tr.report_eval(1.0, 100, quiet=True)
    best = tmp_path / "ckpt_best.npz"
    assert best.exists()
    stamp = best.stat().st_mtime_ns
    fake["v"] = 3.5                      # worse eval: best must survive
    tr.report_eval(2.0, 200, quiet=True)
    assert best.stat().st_mtime_ns == stamp
    fake["v"] = 2.5                      # better eval: best replaced
    tr.report_eval(3.0, 300, quiet=True)
    assert best.stat().st_mtime_ns != stamp

    tr2 = make_trainer(tcfg=tcfg)        # resumed process, fresh object
    assert tr2._best_test_bpc() == 2.5   # seeded from ckpt_best meta
    stamp2 = best.stat().st_mtime_ns
    fake["v"] = 2.75                     # worse than historical best
    tr2.report_eval(1.0, 100, quiet=True)
    assert best.stat().st_mtime_ns == stamp2


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    tr = make_trainer()
    path = str(tmp_path / "ck.npz")
    tr.save(path)
    big = make_trainer(mcfg=ModelConfig(hidden=64, num_layers=1, seed=0))
    with pytest.raises(ValueError, match="shape mismatch"):
        big.restore(path)


def test_sampler_deterministic_given_key():
    cfg = ModelConfig(hidden=16, num_layers=1, seed=0)
    params = init_params(cfg)
    key = jax.random.PRNGKey(3)
    h, c = init_state(cfg, 1)
    first = jnp.asarray([65], jnp.int32)
    ids1, _ = sampler_mod.sample_ids(params, cfg, key, first, h, c, 50)
    ids2, _ = sampler_mod.sample_ids(params, cfg, key, first, h, c, 50)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
    assert ids1.shape == (50, 1)
    assert 0 <= int(ids1.min()) and int(ids1.max()) < 256


def test_sample_text_returns_string():
    tr = make_trainer()
    tr.run(steps=50, quiet=True)
    text = tr.sample(length=64)
    assert isinstance(text, str) and len(text) == 64


def test_flop_model_positive_and_scales():
    small = metrics_mod.lstm_flops_per_char(ModelConfig(hidden=128))
    big = metrics_mod.lstm_flops_per_char(ModelConfig(hidden=512))
    assert big > small * 6  # ~quadratic in N (x@W term is linear)
    stacked = metrics_mod.lstm_flops_per_char(ModelConfig(hidden=128, num_layers=3))
    assert stacked > 2 * small
    assert metrics_mod.param_count(ModelConfig(hidden=512)) == (
        256 * 2048 + 512 * 2048 + 2048 + 512 * 256 + 256
    )


def test_results_table_jsonl(tmp_path):
    path = str(tmp_path / "res.jsonl")
    table = metrics_mod.ResultsTable(path)
    row = metrics_mod.ResultRow(0, 10, 1000, 1.5, 3.0, 3.1, 12.0, 5000.0, 0.01)
    table.append(row)
    import json

    with open(path) as f:
        loaded = json.loads(f.readline())
    assert loaded["test_bpc"] == 3.1 and loaded["step"] == 10


def test_stride_one_sliding_mode():
    """Sliding-window mode (stride=1, the class_batch scheme) trains and
    learns like segment mode."""
    dcfg = DataConfig(batch=8, seq=16, stride=1, train_percent=0.9)
    tr = make_trainer(dcfg=dcfg)
    tr.state, m0 = tr.superstep(tr.state)
    tr.run(steps=200, quiet=True)
    assert tr.last_metrics["train_bpc"] < float(m0["bits_mean"]) - 1.0


def test_skip_nonfinite_guards_update():
    """A non-finite loss must not corrupt params (reference silently skips
    NaN losses, cu_lstm.h:210-211; we skip the update)."""
    import jax

    from eigen_lstm_tpu.models import lstm as model_mod

    mcfg = ModelConfig(hidden=16, num_layers=1, loss_mode="all", seed=0)
    tcfg = TrainConfig(lr=0.1, superstep=2, eval_every_s=1e9, skip_nonfinite=True)
    tr = make_trainer(mcfg=mcfg, tcfg=tcfg)
    # poison the params with an inf — loss becomes non-finite
    bad_params = jax.tree_util.tree_map(lambda p: p, tr.state.params)
    poisoned = np.asarray(bad_params.Why).copy()
    poisoned[0, 0] = np.inf
    import dataclasses as dc

    tr.state = dc.replace(
        tr.state,
        params=model_mod.LSTMParams(
            bad_params.layers, jnp.asarray(poisoned), bad_params.by
        ),
    )
    before_U = np.asarray(tr.state.params.layers[0].U).copy()
    tr.state, metrics = tr.superstep(tr.state)
    after_U = np.asarray(tr.state.params.layers[0].U)
    # update skipped: U unchanged (inf in Why makes every grad non-finite
    # without the guard)
    np.testing.assert_array_equal(before_U, after_U)


def test_remat_matches_no_remat():
    """Activation rematerialization changes memory, not math."""
    import jax

    from eigen_lstm_tpu.models import lstm as model_mod

    base = dict(vocab=16, hidden=8, num_layers=1, loss_mode="all", seed=0)
    cfg_a = ModelConfig(**base)
    cfg_b = ModelConfig(**base, remat=True)
    params = model_mod.init_params(cfg_a)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 16, (6, 4)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 16, (6, 4)), jnp.int32)
    h0, c0 = model_mod.init_state(cfg_a, 4)
    la = model_mod.loss_fn(params, ids, targets, h0, c0, cfg_a)[0]
    lb = model_mod.loss_fn(params, ids, targets, h0, c0, cfg_b)[0]
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    ga = jax.grad(lambda p: model_mod.loss_fn(p, ids, targets, h0, c0, cfg_a)[0])(params)
    gb = jax.grad(lambda p: model_mod.loss_fn(p, ids, targets, h0, c0, cfg_b)[0])(params)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_greedy_sampling_deterministic():
    """temperature=0 -> argmax decoding, independent of the key."""
    from eigen_lstm_tpu.models import init_params as ip, init_state as ist
    from eigen_lstm_tpu.models import sampler as smod

    cfg = ModelConfig(hidden=16, num_layers=1, seed=0)
    params = ip(cfg)
    h, c = ist(cfg, 1)
    first = jnp.asarray([65], jnp.int32)
    ids1, _ = smod.sample_ids(params, cfg, jax.random.PRNGKey(0), first, h, c, 30, temperature=0.0)
    ids2, _ = smod.sample_ids(params, cfg, jax.random.PRNGKey(99), first, h, c, 30, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))


def test_trainer_gradcheck_runs():
    """fp32 config: the in-training gradcheck runs on the fp64 shadow
    (reference gradcheck models are all Eigen::MatrixXd — double), so it
    must PASS on healthy code rather than drown in fp32 FD roundoff."""
    tr = make_trainer()
    tr.run(steps=10, quiet=True)
    ok = tr.gradcheck(samples_per_tensor=5, quiet=True)
    assert ok is True
    assert tr.gradcheck_failures == 0


def test_gradcheck_every_catches_planted_vjp_bug(x64):
    """--gradcheck-every (the reference's per-epoch mid-training FD oracle,
    lstm_eigen_class/lstm.cc:114-115,146): the cadence checks the *live
    backend's* backward, so a planted bug in a hand-written VJP — here the
    recurrent-weight cotangent scaled 3x, forward untouched — is caught
    mid-run, while the clean backend sails through the same cadence."""
    from eigen_lstm_tpu.models import lstm as model_mod

    mcfg = ModelConfig(
        hidden=6, vocab=256, num_layers=1, loss_mode="all", seed=0,
        param_dtype="float64", compute_dtype="float64",
    )

    def make_cell(corrupt):
        def cell(layer, xw, h0, c0, cfg):
            @jax.custom_vjp
            def f(layer, xw, h0, c0):
                return model_mod._scan_layer(layer, xw, h0, c0, cfg)

            def fwd(layer, xw, h0, c0):
                return f(layer, xw, h0, c0), (layer, xw, h0, c0)

            def bwd(res, ct):
                _, vjp = jax.vjp(
                    lambda *a: model_mod._scan_layer(*a, cfg), *res
                )
                dlayer, dxw, dh0, dc0 = vjp(ct)
                if corrupt:
                    dlayer = jax.tree_util.tree_map(lambda g: 3.0 * g, dlayer)
                return dlayer, dxw, dh0, dc0

            f.defvjp(fwd, bwd)
            return f(layer, xw, h0, c0)

        return cell

    for corrupt in (False, True):
        tr = make_trainer(
            mcfg=mcfg,
            dcfg=DataConfig(batch=4, seq=8, train_percent=0.9),
            tcfg=TrainConfig(
                lr=0.1, superstep=2, steps=2, eval_every_s=1e9,
                gradcheck_every=1, gradcheck_samples=10,
            ),
            cell_fn=make_cell(corrupt),
        )
        tr.run(quiet=True)
        if corrupt:
            assert tr.gradcheck_failures > 0, "planted VJP bug not caught"
        else:
            assert tr.gradcheck_failures == 0


def test_gradcheck_every_runs_under_tp(monkeypatch):
    """VERDICT r4 #4: --gradcheck-every's fp64-shadow FD oracle runs in
    EVERY parallel mode (it checks canonical_params() through the oracle
    loss on the host CPU — mode-independent; the reference's per-epoch
    oracle, lstm_eigen_class/lstm.cc:114-146). A healthy TP run passes the
    cadence; a planted 3x bug in the oracle's hand-written embedding VJP
    (ops/cell.py) is caught mid-run under TP."""
    from eigen_lstm_tpu.ops import cell as cell_ops
    from eigen_lstm_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh(8, axis="model")
    mcfg = ModelConfig(hidden=16, num_layers=1, loss_mode="all", seed=0)
    dcfg = DataConfig(batch=8, seq=8, train_percent=0.9)
    tcfg = TrainConfig(
        lr=0.1, superstep=2, steps=2, eval_every_s=1e9,
        gradcheck_every=1, gradcheck_samples=8,
    )
    train, test = corpus_mod.split(synthetic_corpus(), dcfg.train_percent)

    tr = Trainer(mcfg, dcfg, tcfg, train, test, mesh=mesh, parallel="tp")
    tr.run(quiet=True)
    assert tr.gradcheck_failures == 0

    real_embed = cell_ops.embed

    def corrupt_embed(W, ids, compute_dtype=jnp.float32,
                      accum_dtype=jnp.float32):
        @jax.custom_vjp
        def f(w):
            return real_embed(w, ids, compute_dtype, accum_dtype)

        def fwd(w):
            out, vjp = jax.vjp(
                lambda wv: real_embed(wv, ids, compute_dtype, accum_dtype), w
            )
            return out, vjp

        def bwd(vjp, g):
            (dW,) = vjp(g)
            return (3.0 * dW,)

        f.defvjp(fwd, bwd)
        return f(W)

    monkeypatch.setattr(cell_ops, "embed", corrupt_embed)
    tr2 = Trainer(mcfg, dcfg, tcfg, train, test, mesh=mesh, parallel="tp")
    tr2.run(quiet=True)
    assert tr2.gradcheck_failures > 0, "planted oracle VJP bug not caught"


def test_eval_tiny_test_split():
    """Evaluator handles a test split smaller than eval_batch*chunk."""
    tr = make_trainer()
    tiny = tr.test_np[:40]
    bpc = eval_mod.evaluate_bpc(tr.state.params, tiny, tr.mcfg, eval_batch=16, chunk=128)
    assert np.isfinite(bpc) and 0 < bpc < 10
    with pytest.raises(ValueError, match="too small"):
        eval_mod.evaluate_bpc(tr.state.params, tiny[:1], tr.mcfg)


def test_timed_eval_cadence_writes_rows_and_samples(tmp_path):
    """The reference's every-interval block (eval + results row + checkpoint
    + sample dump, class_CUDA/lstm.cc:188-238) end-to-end."""
    tcfg = TrainConfig(
        lr=0.1, superstep=5, eval_every_s=0.0, eval_chars=500,
        sample_chars=32, checkpoint_dir=str(tmp_path), log_every=5,
    )
    tr = make_trainer(tcfg=tcfg, results_path=str(tmp_path / "res.jsonl"))
    tr.run(steps=15, quiet=True)
    assert len(tr.table.rows) >= 2
    row = tr.table.rows[-1]
    assert np.isfinite(row.test_bpc) and row.step > 0
    assert (tmp_path / "ckpt.npz").exists()
    samples = list(tmp_path.glob("sample_step*.txt"))
    assert samples, "no sample dumps written"
    assert len(samples[0].read_text()) == 32
    import json

    with open(tmp_path / "res.jsonl") as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == len(tr.table.rows)


def test_dropout_trains_and_eval_is_deterministic():
    """dropout>0: trains (finite falling bpc), leaves the reset-RNG
    trajectory of dropout=0 runs untouched (cursor/positions identical),
    and the evaluator/sampler never apply masks (eval bpc reproducible)."""
    import dataclasses

    import jax

    from eigen_lstm_tpu import DataConfig, ModelConfig, TrainConfig
    from eigen_lstm_tpu.train.trainer import Trainer

    data = np.tile(np.arange(17, dtype=np.uint8) + 65, 600)
    mcfg0 = ModelConfig(hidden=32, num_layers=2, loss_mode="all", seed=1)
    mcfg_d = dataclasses.replace(mcfg0, dropout=0.3)
    dcfg = DataConfig(path="", train_percent=0.9, batch=4, seq=8)
    tcfg = TrainConfig(lr=0.1, superstep=5, steps=40, eval_every_s=1e9, seed=5)

    tr0 = Trainer(mcfg0, dcfg, tcfg, data[:540], data[540:])
    trd = Trainer(mcfg_d, dcfg, tcfg, data[:540], data[540:])
    m0 = tr0.run(steps=40, quiet=True)
    md = trd.run(steps=40, quiet=True)
    assert np.isfinite(md["train_bpc"])
    # masks perturb the math but not the data pipeline's RNG stream
    np.testing.assert_array_equal(
        np.asarray(tr0.state.positions), np.asarray(trd.state.positions)
    )
    # params must actually differ (dropout really applied)
    a = np.asarray(tr0.state.params.layers[1].U)
    b = np.asarray(trd.state.params.layers[1].U)
    assert not np.allclose(a, b)
    # eval has no mask stream: identical back-to-back
    e1 = trd.evaluate(max_chars=50)
    e2 = trd.evaluate(max_chars=50)
    assert e1 == e2 and np.isfinite(e1)
    # learning still happens on the periodic corpus (8.0 = uniform start)
    assert md["train_bpc"] < 5.0


def test_dropout_dp_runs():
    """dropout through the DP shard_map path (per-shard decorrelated
    masks)."""
    import dataclasses

    from eigen_lstm_tpu import DataConfig, ModelConfig, TrainConfig
    from eigen_lstm_tpu.parallel.mesh import make_mesh
    from eigen_lstm_tpu.train.trainer import Trainer

    data = np.tile(np.arange(17, dtype=np.uint8) + 65, 600)
    mcfg = ModelConfig(hidden=32, num_layers=2, loss_mode="all", seed=1,
                       dropout=0.2)
    dcfg = DataConfig(path="", train_percent=1.0, batch=8, seq=8)
    tcfg = TrainConfig(lr=0.1, superstep=5, steps=20, eval_every_s=1e9, seed=5)
    tr = Trainer(mcfg, dcfg, tcfg, data, None, mesh=make_mesh(8), parallel="dp")
    m = tr.run(steps=20, quiet=True)
    assert np.isfinite(m["train_bpc"])


def test_cyclic_lr_schedule_values():
    """schedule_lr: warmup holds 0; within a cycle lr decays linearly from lr
    to lr*min_frac then resets (SWA's cyclic schedule, Izmailov et al. 2018)."""
    cfg = TrainConfig(lr=0.1, warmup_steps=10, lr_cycle_steps=100,
                      lr_cycle_min_frac=0.1)
    lr = lambda s: float(opt_mod.schedule_lr(cfg, jnp.asarray(s)))
    assert lr(5) == 0.0                                  # warmup
    assert lr(10) == pytest.approx(0.1)                  # cycle start
    assert lr(60) == pytest.approx(0.1 * (1 - 0.9 * 0.5))  # mid-cycle
    assert lr(109) == pytest.approx(0.1 * (1 - 0.9 * 0.99))  # near minimum
    assert lr(110) == pytest.approx(0.1)                 # reset
    # disabled cycle == plain warmup schedule
    flat = TrainConfig(lr=0.1, warmup_steps=10)
    assert float(opt_mod.schedule_lr(flat, jnp.asarray(60))) == pytest.approx(0.1)


def test_cyclic_lr_trains():
    """A run with the cyclic schedule enabled still learns the periodic
    pattern (end-to-end through the jitted superstep)."""
    tcfg = TrainConfig(lr=0.1, superstep=10, steps=200, warmup_steps=10,
                       lr_cycle_steps=50, lr_cycle_min_frac=0.2,
                       eval_every_s=1e9)
    tr = make_trainer(tcfg=tcfg)
    tr.state, m0 = tr.superstep(tr.state)
    first = float(m0["bits_mean"])
    tr.run(steps=200, quiet=True)
    assert tr.last_metrics["train_bpc"] < first - 1.5


def test_load_params_public_api(tmp_path):
    """checkpoint.load_params: the public params-only loading path used by
    scripts/ensemble_eval.py and scripts/swa.py — restores exactly the
    parameter tensors (not optimizer/stream state) from a full checkpoint."""
    tr = make_trainer()
    tr.run(steps=20, quiet=True)
    path = str(tmp_path / "ck.npz")
    tr.save(path)
    tr2 = make_trainer()
    loaded = ckpt_mod.load_params(path, tr2.state.params)
    np.testing.assert_array_equal(np.asarray(loaded.Why), np.asarray(tr.state.params.Why))
    np.testing.assert_array_equal(
        np.asarray(loaded.layers[0].W), np.asarray(tr.state.params.layers[0].W)
    )
    # same treedef as the template, so it drops into eval/ensemble tooling
    assert jax.tree_util.tree_structure(loaded) == jax.tree_util.tree_structure(
        tr2.state.params
    )
