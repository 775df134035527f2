"""Interop with the reference's text checkpoint format.

The reference saves one whitespace text file per tensor with a name prefix:
``<prefix>_W.txt``, ``_U.txt``, ``_b.txt``, ``_Why.txt``, ``_by.txt``
(``class_CUDA/lstm.h:83-101``; writer ``io.h:16-32`` streams the Eigen matrix
row-by-row, reader ``io.h:36-74`` parses whitespace-separated values into a
fixed-shape matrix). 123 MB of trained checkpoints in this format ship in the
reference tree (``models/``) — this module lets a reference user load those
weights directly into the TPU framework (and export back).

Layout mapping (reference is column-vector math, ours is row-major TPU):
  ref W   (4N, M)  -> ours layers[0].W = ref.T   (M, 4N)
  ref U   (4N, N)  -> ours layers[0].U = ref.T   (N, 4N)
  ref b   (4N, 1)  -> ours layers[0].b = ref[:,0]
  ref Why (M, N)   -> ours Why = ref.T            (N, M)
  ref by  (M, 1)   -> ours by = ref[:,0]
Gate packing is [i; o; f; u] blocks of N in both (root ``lstm.cc:77``), so a
plain transpose preserves gate order.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.lstm import LayerParams, LSTMParams

TENSORS = ("W", "U", "b", "Why", "by")


def load_text_matrix(path: str, rows: int, cols: int) -> np.ndarray:
    """Whitespace-float parse into (rows, cols), mirroring ``io.h:36-74``.
    Uses the native strtod parser when built (utils/native.py)."""
    from . import native

    vals = native.parse_floats(path, rows * cols)
    if vals.size != rows * cols:
        raise ValueError(
            f"{path}: expected {rows}x{cols}={rows*cols} values, got {vals.size}"
        )
    return vals.reshape(rows, cols)


def save_text_matrix(path: str, mat: np.ndarray) -> None:
    """Row-per-line whitespace text, as the reference's ``file << m``
    (``io.h:16-32``). Native writer when built."""
    from . import native

    native.write_matrix(path, np.atleast_2d(mat))


def load_reference_checkpoint(prefix: str, cfg: ModelConfig) -> LSTMParams:
    """Load a reference-format checkpoint (e.g. the shipped
    ``models/enwik8_*`` files) into ``LSTMParams``. Only 1-layer models exist
    in the reference."""
    if cfg.num_layers != 1:
        raise ValueError("reference checkpoints are always 1-layer")
    n, m = cfg.hidden, cfg.vocab
    dt = cfg.pdtype
    W = load_text_matrix(f"{prefix}_W.txt", 4 * n, m)
    U = load_text_matrix(f"{prefix}_U.txt", 4 * n, n)
    b = load_text_matrix(f"{prefix}_b.txt", 4 * n, 1)
    Why = load_text_matrix(f"{prefix}_Why.txt", m, n)
    by = load_text_matrix(f"{prefix}_by.txt", m, 1)
    layer = LayerParams(
        jnp.asarray(W.T, dt), jnp.asarray(U.T, dt), jnp.asarray(b[:, 0], dt)
    )
    return LSTMParams((layer,), jnp.asarray(Why.T, dt), jnp.asarray(by[:, 0], dt))


def save_reference_checkpoint(params: LSTMParams, prefix: str) -> None:
    """Export to the reference's text format (inverse mapping)."""
    if len(params.layers) != 1:
        raise ValueError("reference format only holds 1-layer models")
    os.makedirs(os.path.dirname(os.path.abspath(prefix)), exist_ok=True)
    layer = params.layers[0]
    save_text_matrix(f"{prefix}_W.txt", np.asarray(layer.W, np.float64).T)
    save_text_matrix(f"{prefix}_U.txt", np.asarray(layer.U, np.float64).T)
    save_text_matrix(f"{prefix}_b.txt", np.asarray(layer.b, np.float64)[:, None])
    save_text_matrix(f"{prefix}_Why.txt", np.asarray(params.Why, np.float64).T)
    save_text_matrix(f"{prefix}_by.txt", np.asarray(params.by, np.float64)[:, None])
