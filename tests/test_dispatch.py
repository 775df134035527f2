"""Backend dispatch gating tests."""

import jax
import pytest

from eigen_lstm_tpu import ModelConfig
from eigen_lstm_tpu.ops.dispatch import pallas_supported, select_cell_fn


def test_cpu_platform_falls_back_to_xla():
    # the test suite runs on CPU, so pallas is never auto-selected
    assert not pallas_supported(ModelConfig(hidden=512), 128)
    assert select_cell_fn("auto", ModelConfig(hidden=512), 128) is None
    assert select_cell_fn("xla", ModelConfig(hidden=512), 128) is None


def test_pallas_explicitly_requested_on_cpu_raises():
    with pytest.raises(ValueError, match="unsupported"):
        select_cell_fn("pallas", ModelConfig(hidden=512), 128)


def test_unknown_backend_rejected():
    with pytest.raises(ValueError, match="unknown backend"):
        select_cell_fn("cuda", ModelConfig(hidden=512), 128)


def test_alignment_gates(monkeypatch):
    """Simulate a TPU platform to exercise the shape/VMEM gates."""

    class FakeDev:
        platform = "tpu"

    monkeypatch.setattr(jax, "devices", lambda: [FakeDev()])
    assert pallas_supported(ModelConfig(hidden=512), 128)
    # misaligned hidden / batch
    assert not pallas_supported(ModelConfig(hidden=100), 128)
    assert not pallas_supported(ModelConfig(hidden=512), 3)
    # N=2048 exceeds the resident-U VMEM budget even in bf16 -> tiled kernel
    from eigen_lstm_tpu.ops.dispatch import resident_supported, tiled_supported

    big_bf16 = ModelConfig(
        hidden=2048, compute_dtype="bfloat16", residual_dtype="bfloat16"
    )
    assert not resident_supported(big_bf16, 128)
    assert tiled_supported(big_bf16, 128)
    assert pallas_supported(big_bf16, 128)
    # N=2048 fp32 fits neither path -> XLA fallback
    assert not pallas_supported(ModelConfig(hidden=2048), 128)
    # N=1024 resident only in bf16; tiled covers fp32
    assert resident_supported(ModelConfig(hidden=1024, compute_dtype="bfloat16"), 128)
    assert not resident_supported(ModelConfig(hidden=1024), 128)
    assert tiled_supported(ModelConfig(hidden=1024), 128)
