"""GEMM micro-tests — the rebuild's analogue of the reference's standalone
``mmul.cc`` transposed-GEMM check (class_CUDA/mmul.cc:74-85) and
``test_cublas`` (lstm_eigen_CUDA/lstm.cu:835-873): the mixed-precision matmul
policy vs a float64 oracle, including the transposed contractions used in
the backward pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigen_lstm_tpu.ops.cell import matmul


@pytest.mark.parametrize("shape", [(32, 48, 64), (128, 256, 512)])
def test_matmul_fp32_accuracy(shape):
    m, k, n = shape
    rng = np.random.default_rng(0)
    a = rng.normal(size=(m, k)).astype(np.float32)
    b = rng.normal(size=(k, n)).astype(np.float32)
    oracle = a.astype(np.float64) @ b.astype(np.float64)
    got = np.asarray(matmul(jnp.asarray(a), jnp.asarray(b), jnp.float32))
    # normalize by the oracle RMS — elementwise relative error is unbounded
    # where the oracle crosses zero (same metric the reference's
    # cuda_check_matrix_error uses a max/mean split for)
    rms = np.sqrt(np.mean(oracle**2))
    rel = np.abs(got - oracle) / rms
    assert rel.max() < 1e-5 * np.sqrt(k), rel.max()


def test_matmul_bf16_policy_keeps_fp32_accum():
    """bf16 inputs, fp32 accumulation: error should scale like bf16 rounding
    of the inputs (~1e-2 relative), not like bf16 accumulation (~1e-1)."""
    rng = np.random.default_rng(1)
    k = 2048
    a = rng.normal(size=(16, k)).astype(np.float32)
    b = rng.normal(size=(k, 16)).astype(np.float32)
    oracle = a.astype(np.float64) @ b.astype(np.float64)
    got = np.asarray(matmul(jnp.asarray(a), jnp.asarray(b), jnp.bfloat16))
    assert got.dtype == np.float32
    rms = np.sqrt(np.mean(oracle**2))
    rel = np.abs(got - oracle) / rms
    # bf16 input rounding: ~2^-8 per element, growing ~sqrt(k) on random
    # data; bf16 *accumulation* would be ~50x worse at k=2048
    assert rel.max() < 0.05, rel.max()


def test_transposed_contractions_match_oracle():
    """A·Bᵀ and Aᵀ·B via dot_general — the backward-pass contractions
    (dh = dg·Uᵀ, dU = h_prevᵀ·dg) checked like mmul.cc does."""
    rng = np.random.default_rng(2)
    a = rng.normal(size=(64, 128)).astype(np.float32)
    b = rng.normal(size=(96, 128)).astype(np.float32)
    abt = np.asarray(
        jax.lax.dot_general(
            jnp.asarray(a), jnp.asarray(b),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )
    np.testing.assert_allclose(abt, a @ b.T, rtol=1e-5, atol=1e-5)
    c = rng.normal(size=(64, 96)).astype(np.float32)
    atc = np.asarray(
        jax.lax.dot_general(
            jnp.asarray(a), jnp.asarray(c),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )
    np.testing.assert_allclose(atc, a.T @ c, rtol=1e-5, atol=1e-5)
