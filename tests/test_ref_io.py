"""Reference text-checkpoint interop tests (utils/ref_io.py).

Round-trip through the reference's io.h whitespace format, and — when the
reference tree is mounted — load an actual shipped trained checkpoint and
verify it produces far-better-than-uniform bits/char.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from eigen_lstm_tpu import ModelConfig
from eigen_lstm_tpu.models import init_params
from eigen_lstm_tpu.utils import ref_io

REF_MODELS = (
    "/root/reference/optimized-obsfuscated_versions/lstm_eigen_class_CUDA/models"
)


def test_roundtrip(tmp_path):
    cfg = ModelConfig(vocab=32, hidden=8, num_layers=1, seed=0)
    params = init_params(cfg)
    prefix = str(tmp_path / "ck")
    ref_io.save_reference_checkpoint(params, prefix)
    loaded = ref_io.load_reference_checkpoint(prefix, cfg)
    for a, b in [
        (params.layers[0].W, loaded.layers[0].W),
        (params.layers[0].U, loaded.layers[0].U),
        (params.layers[0].b, loaded.layers[0].b),
        (params.Why, loaded.Why),
        (params.by, loaded.by),
    ]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_wrong_size_rejected(tmp_path):
    cfg = ModelConfig(vocab=32, hidden=8, num_layers=1, seed=0)
    params = init_params(cfg)
    prefix = str(tmp_path / "ck")
    ref_io.save_reference_checkpoint(params, prefix)
    bigger = ModelConfig(vocab=32, hidden=16, num_layers=1)
    with pytest.raises(ValueError, match="expected"):
        ref_io.load_reference_checkpoint(prefix, bigger)


@pytest.mark.skipif(not os.path.isdir(REF_MODELS), reason="reference tree not mounted")
def test_load_real_reference_checkpoint():
    """Load the reference's shipped trained enwik8 N=256 checkpoint and check
    it beats uniform (8 bits) by a wide margin on enwik bytes — proof the
    layout mapping (transpose + gate order) is right."""
    from eigen_lstm_tpu.train import evaluator as eval_mod

    prefix = os.path.join(REF_MODELS, "enwik8_test_25_256")
    if not os.path.exists(prefix + "_W.txt"):
        pytest.skip("expected checkpoint files missing")
    cfg = ModelConfig(vocab=256, hidden=256, num_layers=1)
    params = ref_io.load_reference_checkpoint(prefix, cfg)
    with open("/root/reference/enwik6.txt", "rb") as f:
        data = np.frombuffer(f.read(), np.uint8)
    bpc = eval_mod.evaluate_bpc(params, data[:20000], cfg, eval_batch=4, chunk=64)
    # reference logs report ~2.9 test bpc for this model (BASELINE.md); the
    # mapping being wrong would give >= 8 bits (uniform) or garbage
    assert bpc < 4.0, f"reference checkpoint scored {bpc} bpc — layout mapping broken?"
