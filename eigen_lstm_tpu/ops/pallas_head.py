"""Fused softmax-cross-entropy head kernel.

Profile of the headline training step (docs/PERFORMANCE.md): the two
recurrence kernels run at 74-85% of peak, but ~60% of the step is XLA
fusions — dominated by the loss head, whose backward materializes logits,
log-probs, and dlogits (each (S·B, M) f32, ~13 MB at the headline config)
to HBM between fusions. This module fuses the head end-to-end:

* forward kernel: chunked over the S·B token axis; per chunk one MXU matmul
  ``h @ Why`` + a stabilized log-sum-exp and the target-logit gather (iota
  compare — no TPU-hostile gather op), accumulating the total bits in VMEM.
  Only the scalar leaves the kernel.
* backward kernel: recomputes the chunk's logits (1.7 GFLOP — cheaper than
  round-tripping 3x13 MB through HBM), forms ``dlogits = (softmax - onehot)
  * cot`` in registers, and produces all three cotangents in one pass:
  ``dh = dlogits @ Why^T`` (written chunk-wise), and ``dWhy/dby``
  accumulated in VMEM scratch across chunks, written once at the end.

Wrapped in a custom VJP (``fused_head_bits``) that returns the *sum* of
-log2 p(target) over all tokens; models.lstm.loss_fn divides by the token
count. Parity vs the jnp head (logits_from_h + softmax_xent_bits) is gated
by tests/test_pallas_head.py. Reference counterpart: the softmax + loss
block of ``class_CUDA/cu_lstm.h:188-215`` (exp kernel, ones-GEMM row-sum,
divide kernel, neglog + cublasSasum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from .pallas_cell import _prec, _use_interpret

LN2 = 0.6931471805599453


def _pick_chunk(t: int, target: int = 2048) -> int:
    """Largest divisor of t that is <= target and a multiple of 8
    (sublane alignment); falls back to t itself when t is small."""
    if t <= target:
        return t
    best = 0
    for c in range(8, target + 1, 8):
        if t % c == 0:
            best = c
    return best


def _fwd_head_kernel(m, n_chunks, Why_ref, by_ref, h_ref, tgt_ref,
                     bits_ref, lse_ref):
    k = pl.program_id(0)
    tc = h_ref.shape[0]

    @pl.when(k == 0)
    def _():
        bits_ref[:] = jnp.zeros_like(bits_ref)

    logits = (
        jnp.dot(h_ref[:], Why_ref[:], preferred_element_type=jnp.float32,
                precision=_prec(Why_ref.dtype))
        + by_ref[:]
    )
    # keep every reduction 2-D (tc, 1): 1-D tc-lane vectors trip Mosaic
    # relayouts at large chunk sizes
    mx = jnp.max(logits, axis=-1, keepdims=True)
    lse = mx + jnp.log(jnp.sum(jnp.exp(logits - mx), axis=-1, keepdims=True))
    cols = jax.lax.broadcasted_iota(jnp.int32, (tc, m), 1)
    tgt = tgt_ref[:]                                   # (tc, 1)
    logit_t = jnp.sum(
        jnp.where(cols == tgt, logits, 0.0), axis=-1, keepdims=True
    )
    bits_ref[:] += (jnp.sum(lse - logit_t) * (1.0 / LN2)).reshape(1, 1)
    lse_ref[:] = lse                                   # residual for bwd


def _bwd_head_kernel(m, n_chunks, Why_ref, by_ref, h_ref, tgt_ref, lse_ref,
                     cot_ref, dh_ref, dWhy_ref, dby_ref, dWhy_s, dby_s):
    k = pl.program_id(0)
    tc = h_ref.shape[0]

    @pl.when(k == 0)
    def _():
        dWhy_s[:] = jnp.zeros_like(dWhy_s)
        dby_s[:] = jnp.zeros_like(dby_s)

    logits = (
        jnp.dot(h_ref[:], Why_ref[:], preferred_element_type=jnp.float32,
                precision=_prec(Why_ref.dtype))
        + by_ref[:]
    )
    p = jnp.exp(logits - lse_ref[:])
    cols = jax.lax.broadcasted_iota(jnp.int32, (tc, m), 1)
    onehot = (cols == tgt_ref[:]).astype(jnp.float32)
    # d(bits_sum)/d(logits) = (softmax - onehot) / ln2, scaled by the
    # downstream cotangent of the scalar
    dlog = (p - onehot) * (cot_ref[0] * (1.0 / LN2))
    dlog_c = dlog.astype(Why_ref.dtype)
    dh_ref[:] = jax.lax.dot_general(
        dlog_c, Why_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(Why_ref.dtype),
    ).astype(dh_ref.dtype)
    dWhy_s[:] += jax.lax.dot_general(
        h_ref[:], dlog_c,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(Why_ref.dtype),
    )
    dby_s[:] += jnp.sum(dlog, axis=0, keepdims=True)

    @pl.when(k == n_chunks - 1)
    def _():
        dWhy_ref[:] = dWhy_s[:]
        dby_ref[:] = dby_s[:]


@functools.lru_cache(maxsize=64)
def _make_head(t: int, n: int, m: int, chunk: int, cdtype_name: str,
               interpret: bool):
    cdtype = jnp.dtype(cdtype_name).type
    f32 = jnp.float32
    n_chunks = t // chunk

    def fwd_call(Why, by, h, tgt):
        return pl.pallas_call(
            functools.partial(_fwd_head_kernel, m, n_chunks),
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((n, m), lambda k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m), lambda k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, n), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, 1), lambda k: (k, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, 1), lambda k: (k, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, 1), f32),
                jax.ShapeDtypeStruct((t, 1), f32),
            ],
            interpret=interpret,
        )(Why, by, h, tgt)

    def bwd_call(Why, by, h, tgt, lse, cot):
        return pl.pallas_call(
            functools.partial(_bwd_head_kernel, m, n_chunks),
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((n, m), lambda k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m), lambda k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, n), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, 1), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, 1), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),     # cot scalar
            ],
            out_specs=[
                pl.BlockSpec((chunk, n), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, m), lambda k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m), lambda k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((t, n), cdtype),
                jax.ShapeDtypeStruct((n, m), f32),
                jax.ShapeDtypeStruct((1, m), f32),
            ],
            scratch_shapes=[
                pltpu.VMEM((n, m), f32),
                pltpu.VMEM((1, m), f32),
            ],
            interpret=interpret,
        )(Why, by, h, tgt, lse, cot)

    @jax.custom_vjp
    def head_bits_sum(Why, by, h, tgt):
        bits, _ = fwd_call(Why, by, h, tgt)
        return bits[0, 0]

    def head_fwd(Why, by, h, tgt):
        bits, lse = fwd_call(Why, by, h, tgt)
        return bits[0, 0], (Why, by, h, tgt, lse)

    def head_bwd(res, cot):
        Why, by, h, tgt, lse = res
        dh, dWhy, dby = bwd_call(
            Why, by, h, tgt, lse, cot.astype(f32).reshape(1)
        )
        # dby must match the (1, m) primal exactly — standard JAX enforces
        # custom_vjp cotangent shapes (the axon sitecustomize hook disables
        # that check, which hid a (m,) return here)
        return (dWhy.astype(Why.dtype), dby.astype(by.dtype), dh, None)

    head_bits_sum.defvjp(head_fwd, head_bwd)
    return head_bits_sum


def head_supported(cfg: ModelConfig, t: int) -> bool:
    """Alignment + VMEM gate (Why resident + one chunk's working set)."""
    n, m = cfg.hidden, cfg.vocab
    if n % 128 != 0 or m % 128 != 0 or t % 8 != 0:
        return False
    chunk = _pick_chunk(t)
    if chunk % 8 != 0:
        return False
    cbytes = 2 if cfg.compute_dtype == "bfloat16" else 4
    total = (
        n * m * (cbytes + 4)           # Why resident + dWhy accumulator
        + 4 * chunk * n * cbytes       # h in + dh out, double-buffered
        + 3 * chunk * m * 4            # logits/p/dlog working set
        + t * 4 * 2                    # targets + lse residual
    )
    return total <= 13 * 1024 * 1024


def fused_head_bits(params, h_flat, targets_flat, cfg: ModelConfig):
    """Sum over tokens of -log2 p(target). h_flat: (T, N); targets: (T,).
    Same value as softmax_xent_bits(logits_from_h(...)).sum()."""
    t, n = h_flat.shape
    m = cfg.vocab
    chunk = _pick_chunk(t)
    fn = _make_head(
        t, n, m, chunk, jnp.dtype(cfg.cdtype).name, _use_interpret()
    )
    Why = params.Why.astype(cfg.cdtype)
    by = params.by.astype(jnp.float32).reshape(1, m)
    tgt = targets_flat.reshape(t, 1).astype(jnp.int32)
    return fn(Why, by, h_flat.astype(cfg.cdtype), tgt)
