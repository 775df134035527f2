"""Pure-jnp LSTM cell math — the parity oracle for every faster backend.

This module is the single source of truth for the gate math. The Pallas
kernels (``ops/pallas_cell.py``) and the scan model (``models/lstm.py``) are
both tested against it, mirroring how the reference cross-validates its CUDA
path against the Eigen CPU path in lockstep
(``/root/reference/optimized-obsfuscated_versions/lstm_eigen_CUDA/lstm.cu:425-496``).

Gate packing along the last axis is the reference's ``[i; o; f; u]`` order —
input, output, forget, candidate (root ``lstm.cc:77`` comment; block offsets
``lstm.cc:179-192``). Shapes here are transposed vs the reference: the
reference uses column-major ``(4N, B)`` gate matrices; on TPU we use row-major
``(B, 4N)`` so the batch dimension maps to MXU sublanes and the gate dimension
to lanes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def gate_slices(hidden: int):
    """Static slices of the packed (…, 4N) gate axis in reference order."""
    n = hidden
    return (
        slice(0 * n, 1 * n),  # i — input gate
        slice(1 * n, 2 * n),  # o — output gate
        slice(2 * n, 3 * n),  # f — forget gate
        slice(3 * n, 4 * n),  # u — candidate (tanh)
    )


def gate_activations(g_pre: jax.Array, hidden: int) -> jax.Array:
    """sigma on [i,o,f], tanh on [u] (root ``lstm.cc:179-182``).

    ``g_pre``: (..., 4N) pre-activations. Returns activated gates, same shape.
    """
    n = hidden
    iof = jax.nn.sigmoid(g_pre[..., : 3 * n])
    u = jnp.tanh(g_pre[..., 3 * n :])
    return jnp.concatenate([iof, u], axis=-1)


def cell_update(
    g: jax.Array, c_prev: jax.Array, hidden: int, variant: str = "reference"
) -> Tuple[jax.Array, jax.Array]:
    """State update from *activated* gates.

    reference variant (root ``lstm.cc:185-192``):
        c = i*u + f*c_prev ;  c <- tanh(c) destructively ;  h = o*c
    The tanh-squashed cell is what is carried to the next step — every
    reference variant does this (``class/lstm.h:95``, ``cu_lstm.h:177``).

    standard variant: raw c carried, h = o*tanh(c).

    Returns ``(h, c_carry)``.
    """
    si, so, sf, su = gate_slices(hidden)
    i, o, f, u = g[..., si], g[..., so], g[..., sf], g[..., su]
    c_raw = i * u + f * c_prev
    if variant == "reference":
        c = jnp.tanh(c_raw)
        h = o * c
        return h, c
    elif variant == "standard":
        h = o * jnp.tanh(c_raw)
        return h, c_raw
    raise ValueError(f"unknown cell variant: {variant}")


def cell_step(
    g_pre: jax.Array, c_prev: jax.Array, hidden: int, variant: str = "reference"
) -> Tuple[jax.Array, jax.Array]:
    """Full cell step from pre-activations ``g_pre = x@W + h@U + b``.

    Returns ``(h, c_carry)``; both (..., N).
    """
    g = gate_activations(g_pre, hidden)
    return cell_update(g, c_prev, hidden, variant)


def matmul(a: jax.Array, w: jax.Array, compute_dtype=jnp.float32, accum_dtype=None) -> jax.Array:
    """MXU matmul with a mixed-precision policy: inputs cast to
    ``compute_dtype`` (bf16 for MXU speed), accumulation forced to
    ``accum_dtype`` (fp32; fp64 for the CPU gradcheck oracle) via
    ``preferred_element_type``. Replaces the reference's cblas_sgemm /
    cublasSgemmEx call sites (``lstm_eigen_BLAS/lstm.cc:548-573``,
    ``class_CUDA/cu_matrix.cu:133-180``).

    ``precision`` is pinned when the compute dtype is fp32/fp64: XLA's
    *default* TPU precision executes fp32 matmuls at bf16 level (measured
    maxerr 1e-2 vs 6e-7 with precision="float32" — scripts/gemm_bench.py),
    which would make --dtype float32 silently bf16 on TPU."""
    if accum_dtype is None:
        accum_dtype = jnp.float64 if compute_dtype == jnp.float64 else jnp.float32
    precision = None if compute_dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    return jnp.dot(
        a.astype(compute_dtype),
        w.astype(compute_dtype),
        preferred_element_type=accum_dtype,
        precision=precision,
    )


def one_hot(ids: jax.Array, vocab: int, dtype=jnp.float32) -> jax.Array:
    """Byte ids -> one-hot rows, replacing the reference's M×M identity
    ``codes`` matrix column-gather (root ``lstm.cc:129,169``)."""
    return jax.nn.one_hot(ids, vocab, dtype=dtype)


@functools.lru_cache(maxsize=64)
def _make_embed(cdtype_name: str, adtype_name: str, vocab: int, wdtype_name: str):
    cdtype = jnp.dtype(cdtype_name).type
    adtype = jnp.dtype(adtype_name).type
    wdtype = jnp.dtype(wdtype_name).type

    @jax.custom_vjp
    def embed_fn(W, ids):
        return W.astype(adtype)[ids]

    def fwd(W, ids):
        return embed_fn(W, ids), ids

    def bwd(ids, g):
        oh = one_hot(ids.reshape(-1), vocab, cdtype)
        dW = jax.lax.dot_general(
            oh, g.reshape(-1, g.shape[-1]).astype(cdtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=adtype,
            precision=(
                None if jnp.dtype(cdtype) == jnp.bfloat16
                else jax.lax.Precision.HIGHEST
            ),
        )
        return (dW.astype(wdtype), None)

    embed_fn.defvjp(fwd, bwd)
    return embed_fn


def embed(W: jax.Array, ids: jax.Array, compute_dtype=jnp.float32, accum_dtype=jnp.float32):
    """Embedding lookup with a TPU-friendly backward.

    Forward is a row gather ``W[ids]`` (zero FLOPs — the reference's one-hot
    GEMM collapses to this, root ``lstm.cc:169``). The *gradient* of a gather
    is a scatter-add, which lowers poorly on TPU, so the custom VJP computes
    ``dW = one_hot(ids)^T @ d_out`` as a single MXU GEMM instead.
    """
    fn = _make_embed(
        jnp.dtype(compute_dtype).name,
        jnp.dtype(accum_dtype).name,
        W.shape[0],
        jnp.dtype(W.dtype).name,
    )
    return fn(W, ids)
