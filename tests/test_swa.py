"""Snapshot retention (--keep-snapshots) + tail weight averaging
(scripts/swa.py): the post-processing lever layered over the reference's
rolling save (``class_CUDA/lstm.cc:224-228``), which keeps one snapshot and
so cannot average."""

import json
import os
import sys

import numpy as np

from eigen_lstm_tpu import TrainConfig

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir, "scripts")
)
import swa  # noqa: E402

from test_train import make_trainer  # noqa: E402


def test_keep_snapshots_writes_per_eval_files(tmp_path):
    tcfg = TrainConfig(
        lr=0.1, superstep=5, eval_every_s=0.0, eval_chars=500,
        sample_chars=0, checkpoint_dir=str(tmp_path), log_every=5,
        keep_snapshots=True,
    )
    tr = make_trainer(tcfg=tcfg)
    tr.run(steps=15, quiet=True)
    snaps = sorted(tmp_path.glob("ckpt_step*.npz"))
    assert len(snaps) >= 2, "per-eval snapshots not retained"
    # each snapshot carries its own held-out score in metadata
    with np.load(snaps[0]) as z:
        meta = json.loads(bytes(z["meta/json"]).decode())
    assert "test_bpc" in meta


def test_swa_average_is_param_mean_and_loadable(tmp_path):
    tcfg = TrainConfig(
        lr=0.1, superstep=5, eval_every_s=0.0, eval_chars=500,
        sample_chars=0, checkpoint_dir=str(tmp_path), log_every=5,
        keep_snapshots=True,
    )
    tr = make_trainer(tcfg=tcfg)
    tr.run(steps=15, quiet=True)
    snaps = sorted(tmp_path.glob("ckpt_step*.npz"), key=swa.step_of)
    assert len(snaps) >= 2
    out = tmp_path / "avg.npz"
    meta = swa.average([str(p) for p in snaps], str(out))
    assert meta["swa_steps"] == [swa.step_of(str(p)) for p in snaps]

    # the averaged params are the exact mean of the inputs
    with np.load(snaps[0]) as z:
        pkeys = [k for k in z.files if k.startswith("params")]
    assert pkeys
    key = pkeys[0]
    stack = []
    for p in snaps:
        with np.load(p) as z:
            stack.append(np.asarray(z[key], dtype=np.float64))
    with np.load(out) as z, np.load(snaps[-1]) as z_last:
        got = np.asarray(z[key], dtype=np.float64)
        # non-param state (optimizer, cursors, meta) carried from the newest
        assert set(z.files) == set(z_last.files)
    np.testing.assert_allclose(got, np.mean(stack, axis=0), rtol=1e-6)

    # the output restores cleanly and evaluates finite
    tr2 = make_trainer(tcfg=tcfg)
    tr2.restore(str(out))
    assert np.isfinite(tr2.evaluate(max_chars=500))
