"""Native C++ IO runtime tests: build, bindings, and parity with the
pure-Python fallbacks and the device-side batcher."""

import numpy as np
import pytest

from eigen_lstm_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no compiler?)")
    return lib


def test_build_and_load(lib):
    assert native.available()


def test_read_file_matches_python(lib, tmp_path):
    p = tmp_path / "c.bin"
    payload = bytes(range(256)) * 10
    p.write_bytes(payload)
    data = native.read_file(str(p))
    np.testing.assert_array_equal(data, np.frombuffer(payload, np.uint8))
    with pytest.raises(FileNotFoundError):
        native.read_file(str(tmp_path / "missing.bin"))


def test_build_windows_matches_device_batcher(lib):
    import jax.numpy as jnp

    from eigen_lstm_tpu.data import corpus as corpus_mod

    rng = np.random.default_rng(0)
    corpus = rng.integers(0, 256, 500).astype(np.uint8)
    positions = np.asarray([0, 100, 450 - 17], np.int32)
    x_n, t_n = native.build_windows(corpus, positions, seq=16)
    x_d, t_d = corpus_mod.make_windows(
        jnp.asarray(corpus), jnp.asarray(positions), 16
    )
    np.testing.assert_array_equal(x_n, np.asarray(x_d))
    np.testing.assert_array_equal(t_n, np.asarray(t_d))


def test_build_windows_rejects_out_of_range(lib):
    corpus = np.zeros(50, np.uint8)
    with pytest.raises(ValueError):
        native.build_windows(corpus, np.asarray([45], np.int32), seq=10)


def test_advance_positions_matches_device(lib):
    import jax.numpy as jnp

    from eigen_lstm_tpu.data import corpus as corpus_mod

    positions = np.asarray([0, 30, 39], np.int32)
    n_native, w_native = native.advance_positions(positions, 10, 50, 10)
    n_dev, w_dev = corpus_mod.advance_positions(
        jnp.asarray(positions), 10, 50, 10
    )
    np.testing.assert_array_equal(n_native, np.asarray(n_dev))
    np.testing.assert_array_equal(w_native, np.asarray(w_dev))


def test_text_matrix_roundtrip_native(lib, tmp_path):
    rng = np.random.default_rng(1)
    mat = rng.normal(size=(7, 5))
    path = str(tmp_path / "m.txt")
    native.write_matrix(path, mat)
    back = native.parse_floats(path, 35).reshape(7, 5)
    np.testing.assert_allclose(back, mat, rtol=1e-9)
    # native parse agrees with numpy's parser on the same file
    np.testing.assert_allclose(np.loadtxt(path), mat, rtol=1e-9)


def test_parse_floats_overflow_detected(lib, tmp_path):
    path = str(tmp_path / "m.txt")
    native.write_matrix(path, np.ones((3, 3)))
    with pytest.raises(ValueError, match="more than"):
        native.parse_floats(path, 4)
