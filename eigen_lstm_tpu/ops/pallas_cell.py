"""Fused Pallas TPU kernel for the LSTM sequence recurrence.

This is the rebuild's counterpart of the reference's hand-written CUDA cell
path (``class_CUDA/cu_lstm.h:162-275`` + ``cu_kernels.cu``), redesigned for
the TPU memory hierarchy rather than translated:

* The recurrent weight U (N, 4N) is pinned in VMEM for the *entire* S-step
  sequence (grid over time, constant index_map) — XLA's default while-loop
  lowering re-streams U from HBM every step, which is the dominant cost at
  small B. One MXU matmul per step: ``h_{t-1} @ U`` with the σ/tanh/cell
  epilogue fused in VPU registers/VMEM.
* The input contribution ``x@W + b`` (``xw``) is precomputed outside as one
  large MXU GEMM / embedding gather over all S steps (models/lstm.py), so
  the kernel's sequential part is only what is mathematically sequential.
* Backward is a custom VJP (reverse-time Pallas kernel): recomputes nothing,
  reads the saved gates g and cells c, produces dg per step and the carried
  dh/dc; the weight gradients dU (and dW via the xw cotangent) are batched
  into single large GEMMs *outside* the kernel where the MXU runs at full
  tilt — the reference instead does 6 small GEMMs per timestep
  (``cu_lstm.h:216-275``).

Parity: validated against the pure-jnp oracle (ops/cell.py + models/lstm.py
scan) to fp32 tolerance — the rebuild's analogue of the reference's
CPU/GPU lockstep cross-validation (``lstm_eigen_CUDA/lstm.cu:425-496``).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _sds(shape, dtype, vma):
    """ShapeDtypeStruct with an optional varying-manual-axes annotation —
    required when a kernel lowers inside a vma-checked ``shard_map`` (the
    sequence-pipelining paths run these kernels per time segment)."""
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))
    return jax.ShapeDtypeStruct(shape, dtype)


def _vma_of(*vals) -> tuple:
    """Union of the inputs' varying manual axes at trace time — the vma the
    kernel outputs must carry. Empty outside shard_map / under
    check_vma=False; {seq} inside 1-D sequence pipelining; {data, seq} on
    the 2-D dp x sp mesh (derived, so callers need no axis plumbing)."""
    vma = frozenset()
    for v in vals:
        vma |= getattr(jax.typeof(v), "vma", frozenset()) or frozenset()
    return tuple(sorted(vma))


def _prec(cdtype):
    """fp32/fp64 matmuls must pin precision: the default TPU precision
    executes them at bf16 level (see ops/cell.py matmul)."""
    return None if jnp.dtype(cdtype) == jnp.bfloat16 else jax.lax.Precision.HIGHEST


def _shr(x, k):
    return jax.lax.shift_right_logical(x, jnp.uint32(k))


def _fmix32(x):
    """murmur3 32-bit finalizer: a full-avalanche integer hash."""
    x = x ^ _shr(x, 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ _shr(x, 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ _shr(x, 16)
    return x


def _keep_mask(seed_ref, tau, shape, row_off, keep_u32, col_off=0,
               n_total=None):
    """Deterministic dropout keep-mask for a (rows, cols) block of one
    timestep's (B, N) hidden state.

    Counter-based hash of (seed, timestep, global element index) — the same
    integer-VPU RNG the fused sampler uses (hardware-validated). Regenerable:
    the backward kernel rebuilds the identical mask from (seed, tau) instead
    of streaming mask bits through HBM, and the bits do not depend on how
    the kernel blocks the state (``row_off``/``col_off``/``n_total`` keep
    element indices global, so resident and tiled kernels draw identical
    masks). The TPU's native PRNG (pltpu.prng_random_bits) is deliberately
    NOT used: the interpreter stubs it to zeros, which would break CPU
    parity tests and the FD-gradcheck oracle."""
    if n_total is None:
        n_total = shape[1]
    # scalar int32 -> uint32 must be astype (two's-complement wrap, same
    # bits): Mosaic's tpu.bitcast only lowers VECTOR operands on hardware,
    # and a scalar lax.bitcast_convert_type fails verification at H>=1
    # (interpret mode accepts it, which is why only the TPU gate sees it)
    base = _fmix32(
        seed_ref[0].astype(jnp.uint32)
        ^ (tau.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    )
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(row_off)
    lanes = (
        jax.lax.broadcasted_iota(jnp.uint32, shape, 1) + jnp.uint32(col_off)
    )
    bits = _fmix32(
        (rows * jnp.uint32(n_total) + lanes) * jnp.uint32(0x85EBCA6B) ^ base
    )
    return bits <= jnp.uint32(keep_u32)


def _keep_u32(drop: float) -> int:
    return int((1.0 - drop) * 0xFFFFFFFF)


def host_keep_mask(seed: int, tau: int, b: int, n: int, drop: float):
    """Host-side (numpy) oracle of ``_keep_mask`` — bit-identical to the
    in-kernel hash. Used by the lockstep tests and the hardware regression
    gate to validate the fused dropout path against explicit masks."""
    import numpy as np

    def fmix(x):
        x = x ^ (x >> np.uint32(16))
        x = (x * np.uint32(0x7FEB352D)).astype(np.uint32)
        x = x ^ (x >> np.uint32(15))
        x = (x * np.uint32(0x846CA68B)).astype(np.uint32)
        return x ^ (x >> np.uint32(16))

    with np.errstate(over="ignore"):
        base = fmix(
            np.uint32(seed & 0xFFFFFFFF)
            ^ (np.uint32(tau) * np.uint32(0x9E3779B9)).astype(np.uint32)
        )
        rows = np.arange(b, dtype=np.uint32)[:, None]
        lanes = np.arange(n, dtype=np.uint32)[None, :]
        idx = (rows * np.uint32(n) + lanes).astype(np.uint32)
        bits = fmix((idx * np.uint32(0x85EBCA6B)).astype(np.uint32) ^ base)
    return bits <= np.uint32(_keep_u32(drop))


def _cell_fwd(i, o, f, u, c_prev, variant):
    """Elementwise cell update from *activated* gates — the single source of
    the parity-critical carry semantics (reference: destructive c <- tanh(c),
    root lstm.cc:185-192) shared by every kernel body. Works on any slice
    width. Returns (h, c_carry)."""
    c_raw = i * u + f * c_prev
    if variant == "reference":
        c2 = jnp.tanh(c_raw)
        return o * c2, c2
    return o * jnp.tanh(c_raw), c_raw


def _gate_bwd(i, o, f, u, c_t, c_prev, dh_total, dc, variant):
    """Elementwise gate backward shared by every backward kernel body (any
    slice width). Returns ((dgi, dgo, dgf, dgu), dc_carried)."""
    if variant == "reference":
        dct = dh_total * o + dc
        dc_raw = dct * (1.0 - c_t * c_t)
        do = dh_total * c_t
    else:
        tc = jnp.tanh(c_t)
        dc_raw = dh_total * o * (1.0 - tc * tc) + dc
        do = dh_total * tc
    di = dc_raw * u
    du = dc_raw * i
    df = dc_raw * c_prev
    return (
        (
            di * i * (1.0 - i),
            do * o * (1.0 - o),
            df * f * (1.0 - f),
            du * (1.0 - u * u),
        ),
        dc_raw * f,
    )


def _fwd_kernel(n, variant, cdtype, af, drop, *refs):
    # ``af``: accumulator dtype — float32 on hardware; float64 only under
    # the interpreter for the FD-gradcheck oracle (utils/gradcheck.py)
    # ``drop`` > 0 adds a seed input and a masked-output stream: the
    # inter-layer dropout mask is applied in the epilogue (hdrop_ref), so
    # the consumer reads a pre-masked stream and XLA's separate
    # read-mask-write pass over (S, B, N) disappears. The unmasked h_seq
    # is still written — it is the recurrence residual for backward.
    if drop > 0.0:
        (U_ref, xw_ref, h0_ref, c0_ref, seed_ref,
         hseq_ref, cseq_ref, gseq_ref, hdrop_ref, h_s, c_s) = refs
    else:
        (U_ref, xw_ref, h0_ref, c0_ref,
         hseq_ref, cseq_ref, gseq_ref, h_s, c_s) = refs
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:].astype(af)
        c_s[:] = c0_ref[:].astype(af)

    h_prev = h_s[:]
    c_prev = c_s[:]
    g_pre = xw_ref[0].astype(af) + jnp.dot(
        h_prev.astype(cdtype), U_ref[:].astype(cdtype),
        preferred_element_type=af, precision=_prec(cdtype),
    )
    iof = jax.nn.sigmoid(g_pre[:, : 3 * n])
    u = jnp.tanh(g_pre[:, 3 * n :])
    h, c_carry = _cell_fwd(
        iof[:, :n], iof[:, n : 2 * n], iof[:, 2 * n : 3 * n], u, c_prev, variant
    )
    h_s[:] = h
    c_s[:] = c_carry
    hseq_ref[0] = h.astype(hseq_ref.dtype)
    cseq_ref[0] = c_carry.astype(cseq_ref.dtype)
    gseq_ref[0] = jnp.concatenate([iof, u], axis=-1).astype(gseq_ref.dtype)
    if drop > 0.0:
        keep = _keep_mask(seed_ref, t, h.shape, 0, _keep_u32(drop))
        inv = jnp.asarray(1.0 / (1.0 - drop), af)
        hdrop_ref[0] = jnp.where(keep, h * inv, 0.0).astype(hdrop_ref.dtype)


def _bwd_kernel(n, s, variant, cdtype, af, drop, *refs):
    # ``drop`` > 0: the incoming output cotangent is w.r.t. the MASKED
    # stream; the identical mask is regenerated from (seed, timestep) in
    # the prologue — dropout backward costs zero extra HBM traffic.
    if drop > 0.0:
        (U_ref, gseq_ref, cseq_ref, cprev_ref, c0_ref, seed_ref,
         dhseq_ref, dhT_ref, dcT_ref,
         dgseq_ref, dh0_ref, dc0_ref, dh_s, dc_s) = refs
    else:
        (U_ref, gseq_ref, cseq_ref, cprev_ref, c0_ref,
         dhseq_ref, dhT_ref, dcT_ref,
         dgseq_ref, dh0_ref, dc0_ref, dh_s, dc_s) = refs
    t = pl.program_id(0)           # iteration t processes timestep s-1-t

    @pl.when(t == 0)
    def _():
        dh_s[:] = dhT_ref[:].astype(af)
        dc_s[:] = dcT_ref[:].astype(af)

    g = gseq_ref[0].astype(af)
    i = g[:, :n]
    o = g[:, n : 2 * n]
    f = g[:, 2 * n : 3 * n]
    u = g[:, 3 * n :]
    c_t = cseq_ref[0].astype(af)
    is_first_step = t == s - 1     # timestep 0
    c_prev = jnp.where(
        is_first_step,
        c0_ref[:].astype(af),
        cprev_ref[0].astype(af),
    )

    dh_cot = dhseq_ref[0].astype(af)
    if drop > 0.0:
        keep = _keep_mask(seed_ref, s - 1 - t, dh_cot.shape, 0, _keep_u32(drop))
        inv = jnp.asarray(1.0 / (1.0 - drop), af)
        dh_cot = jnp.where(keep, dh_cot * inv, 0.0)
    dh_total = dh_cot + dh_s[:]
    dgs, dc_next = _gate_bwd(i, o, f, u, c_t, c_prev, dh_total, dc_s[:], variant)
    dg = jnp.concatenate(dgs, axis=-1)
    dgseq_ref[0] = dg.astype(dgseq_ref.dtype)

    # dh_{t-1} = dg @ U^T  (contract the 4N axis)
    dh_s[:] = jax.lax.dot_general(
        dg.astype(cdtype), U_ref[:].astype(cdtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=af, precision=_prec(cdtype),
    )
    dc_s[:] = dc_next
    # last-write-wins: after the final iteration these hold d(h0), d(c0)
    dh0_ref[:] = dh_s[:]
    dc0_ref[:] = dc_s[:]


@functools.lru_cache(maxsize=64)
def _make_fused_seq(s: int, b: int, n: int, variant: str, cdtype_name: str,
                    rdtype_name: str, interpret: bool,
                    vma: tuple = (), drop: float = 0.0):
    """Build the custom-VJP fused sequence op for static (S, B, N, ...).
    ``rdtype``: storage dtype for the saved h/c/g residual sequences.
    ``drop`` > 0 fuses inter-layer dropout: the op takes an extra ``seed``
    (1,) int32 and its primary output is the MASKED hidden stream (the
    carried (hT, cT) stay unmasked, matching models.lstm.forward's XLA
    semantics); the mask is regenerated in backward from the same seed."""
    cdtype = jnp.dtype(cdtype_name).type
    rdtype = jnp.dtype(rdtype_name).type
    # accumulator dtype: float32 on hardware; float64 under the interpreter
    # when the config asks for it (the FD-gradcheck oracle, tests only)
    f32 = jnp.float64 if cdtype == jnp.float64 else jnp.float32
    # storage dtype of the per-step input stream xw and its cotangent dg:
    # these are the largest HBM streams of the recurrence ((S*B, 4N) each);
    # bf16 halves their traffic under mixed precision
    xdtype = jnp.bfloat16 if cdtype_name == "bfloat16" else f32
    seed_spec = [pl.BlockSpec(memory_space=pltpu.SMEM)] if drop > 0.0 else []

    def fwd_call(U, xw, h0, c0, seed=None):
        drop_out_specs, drop_out_shape = [], []
        if drop > 0.0:
            drop_out_specs = [
                pl.BlockSpec((1, b, n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
            ]
            drop_out_shape = [_sds((s, b, n), rdtype, vma)]
        return pl.pallas_call(
            functools.partial(_fwd_kernel, n, variant, cdtype, f32, drop),
            grid=(s,),
            in_specs=[
                pl.BlockSpec((n, 4 * n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, 4 * n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ] + seed_spec,
            out_specs=[
                pl.BlockSpec((1, b, n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, 4 * n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            ] + drop_out_specs,
            out_shape=[
                _sds((s, b, n), rdtype, vma),
                _sds((s, b, n), rdtype, vma),
                _sds((s, b, 4 * n), rdtype, vma),
            ] + drop_out_shape,
            scratch_shapes=[
                pltpu.VMEM((b, n), f32),
                pltpu.VMEM((b, n), f32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * s * b * n * 4 * n,
                bytes_accessed=(
                    n * 4 * n * 4 + s * b * 4 * n * 4 * 2 + s * b * n * 4 * 2
                ),
                transcendentals=s * b * 5 * n,
            ),
            interpret=interpret,
        )(*([U, xw, h0, c0] + ([seed] if drop > 0.0 else [])))

    def bwd_call(U, g_seq, c_seq, c0, dh_seq, dhT, dcT, seed=None):
        return pl.pallas_call(
            functools.partial(_bwd_kernel, n, s, variant, cdtype, f32, drop),
            grid=(s,),
            in_specs=[
                pl.BlockSpec((n, 4 * n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, 4 * n), lambda t: (s - 1 - t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, n), lambda t: (s - 1 - t, 0, 0), memory_space=pltpu.VMEM),
                # c_{t-1}: same array shifted one step back (clamped at 0;
                # the kernel switches to c0 on the first timestep)
                pl.BlockSpec((1, b, n), lambda t: (jnp.maximum(s - 2 - t, 0), 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ] + seed_spec + [
                pl.BlockSpec((1, b, n), lambda t: (s - 1 - t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, b, 4 * n), lambda t: (s - 1 - t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                _sds((s, b, 4 * n), xdtype, vma),
                _sds((b, n), f32, vma),
                _sds((b, n), f32, vma),
            ],
            scratch_shapes=[
                pltpu.VMEM((b, n), f32),
                pltpu.VMEM((b, n), f32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * s * b * n * 4 * n,
                bytes_accessed=(
                    n * 4 * n * 4 + s * b * 4 * n * 4 * 2 + s * b * n * 4 * 3
                ),
                transcendentals=s * b * n,
            ),
            interpret=interpret,
        )(*([U, g_seq, c_seq, c_seq, c0] + ([seed] if drop > 0.0 else [])
            + [dh_seq, dhT, dcT]))

    def _fwd_core(U, xw, h0, c0, seed):
        outs = fwd_call(U, xw, h0, c0, seed)
        if drop > 0.0:
            h_seq, c_seq, g_seq, hd_seq = outs
        else:
            h_seq, c_seq, g_seq = outs
            hd_seq = h_seq
        return h_seq, c_seq, g_seq, hd_seq

    def _bwd_core(res, cot):
        U, h_seq, c_seq, g_seq, h0, c0, seed = res
        dh_seq, (dhT, dcT) = cot
        dg_seq, dh0, dc0 = bwd_call(
            U, g_seq, c_seq, c0.astype(f32),
            dh_seq.astype(f32),
            dhT.astype(f32), dcT.astype(f32), seed,
        )
        # dU = sum_t h_{t-1}^T dg_t — one large MXU GEMM over all steps
        h_prev = jnp.concatenate([h0[None].astype(h_seq.dtype), h_seq[:-1]], axis=0)
        dU = jax.lax.dot_general(
            h_prev.reshape(s * b, n).astype(cdtype),
            dg_seq.reshape(s * b, 4 * n).astype(cdtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_prec(cdtype),
        )
        return (
            dU.astype(U.dtype),
            dg_seq,                       # d(xw): g_pre = xw + h@U
            dh0.astype(h0.dtype),
            dc0.astype(c0.dtype),
        )

    if drop > 0.0:
        @jax.custom_vjp
        def fused_seq(U, xw, h0, c0, seed):
            h_seq, c_seq, _, hd_seq = _fwd_core(U, xw, h0, c0, seed)
            return hd_seq, (h_seq[s - 1], c_seq[s - 1])

        def fused_seq_fwd(U, xw, h0, c0, seed):
            h_seq, c_seq, g_seq, hd_seq = _fwd_core(U, xw, h0, c0, seed)
            out = (hd_seq, (h_seq[s - 1], c_seq[s - 1]))
            return out, (U, h_seq, c_seq, g_seq, h0, c0, seed)

        def fused_seq_bwd(res, cot):
            return _bwd_core(res, cot) + (None,)
    else:
        @jax.custom_vjp
        def fused_seq(U, xw, h0, c0):
            h_seq, c_seq, _, _ = _fwd_core(U, xw, h0, c0, None)
            return h_seq, (h_seq[s - 1], c_seq[s - 1])

        def fused_seq_fwd(U, xw, h0, c0):
            h_seq, c_seq, g_seq, _ = _fwd_core(U, xw, h0, c0, None)
            out = (h_seq, (h_seq[s - 1], c_seq[s - 1]))
            return out, (U, h_seq, c_seq, g_seq, h0, c0, None)

        def fused_seq_bwd(res, cot):
            return _bwd_core(res, cot)

    fused_seq.defvjp(fused_seq_fwd, fused_seq_bwd)
    fused_seq.bwd_call = bwd_call   # reused by the fused-embedding variant
    return fused_seq


def pallas_scan_layer(layer, xw, h0, c0, cfg: ModelConfig, dropout=None):
    """Drop-in ``cell_fn`` for ``models.lstm.forward``: same signature and
    semantics as the XLA ``_scan_layer`` (bias pre-folded into xw).

    U is pre-cast to the compute dtype so its resident VMEM copy is bf16 in
    mixed precision — this is what admits N=1024 within the VMEM budget.

    ``dropout``: optional ``(rate, seed)`` with seed a (1,) int32 — fuses
    the layer's output dropout into the kernel (see _make_fused_seq)."""
    s, b, _ = xw.shape
    n = cfg.hidden
    if jnp.dtype(cfg.cdtype) == jnp.float64:
        # interpreter-only FD-gradcheck oracle: everything float64
        rdtype = xdtype = af = jnp.float64
    else:
        rdtype = (
            jnp.float32 if cfg.residual_dtype == "float32" else jnp.bfloat16
        )
        xdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        af = jnp.float32
    drop, seed = dropout if dropout is not None else (0.0, None)
    fn = _make_fused_seq(
        s, b, n, cfg.cell_variant, jnp.dtype(cfg.cdtype).name,
        jnp.dtype(rdtype).name,
        _use_interpret(), _vma_of(layer.U, xw, h0, c0), float(drop),
    )
    args = (
        layer.U.astype(cfg.cdtype), xw.astype(xdtype),
        h0.astype(af), c0.astype(af),
    )
    if drop > 0.0:
        h_seq, (hT, cT) = fn(*args, seed)
    else:
        h_seq, (hT, cT) = fn(*args)
    return h_seq, (hT.astype(cfg.pdtype), cT.astype(cfg.pdtype))


# ---------------------------------------------------------------------------
# Fused-embedding variant (layer 0): the per-step input contribution W·x is
# computed INSIDE the kernel as onehot(ids) concatenated with h_{t-1} against
# the stacked weight [W; U] — one MXU matmul per step, eliminating the
# precomputed xw stream entirely ((S·B, 4N) — the recurrence's largest HBM
# traffic). This is the full TPU-native fusion of the reference's
# per-timestep W·x_t + U·h_{t-1} GEMM pair (root lstm.cc:176).
# ---------------------------------------------------------------------------


def _fwd_embed_kernel(n, m, variant, cdtype, n_split, drop, *refs):
    if drop > 0.0:
        (WU_ref, b_ref, ids_ref, h0_ref, c0_ref, seed_ref,
         hseq_ref, cseq_ref, gseq_ref, hdrop_ref, h_s, c_s, xh_s) = refs
    else:
        (WU_ref, b_ref, ids_ref, h0_ref, c0_ref,
         hseq_ref, cseq_ref, gseq_ref, h_s, c_s, xh_s) = refs
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:].astype(jnp.float32)
        c_s[:] = c0_ref[:].astype(jnp.float32)

    b_sz = h_s.shape[0]
    bs = b_sz // n_split
    ids_t = ids_ref[t]                                   # (B,) int32
    cols = jax.lax.broadcasted_iota(jnp.int32, (bs, m), 1)

    # n_split > 1 staggers the batch into half-blocks so block p's VPU
    # epilogue can overlap block p+1's MXU matmul (the serialized epilogue
    # is the headline kernel's residual cost, docs/PERFORMANCE.md): emit
    # build_p, matmul_p interleaved, then the epilogues.
    pres = []
    for p in range(n_split):
        sl = slice(p * bs, (p + 1) * bs)
        ids_p = jax.lax.slice_in_dim(ids_t, p * bs, (p + 1) * bs)
        onehot = (cols == ids_p[:, None]).astype(cdtype)
        xh_s[sl, :m] = onehot
        xh_s[sl, m:] = h_s[sl, :].astype(cdtype)
        pres.append(
            jnp.dot(xh_s[sl, :], WU_ref[:], preferred_element_type=jnp.float32,
                    precision=_prec(cdtype))
            + b_ref[:]
        )
    for p in range(n_split):
        sl = slice(p * bs, (p + 1) * bs)
        g_pre = pres[p]
        iof = jax.nn.sigmoid(g_pre[:, : 3 * n])
        u = jnp.tanh(g_pre[:, 3 * n :])
        h, c_carry = _cell_fwd(
            iof[:, :n], iof[:, n : 2 * n], iof[:, 2 * n : 3 * n], u,
            c_s[sl, :], variant,
        )
        h_s[sl, :] = h
        c_s[sl, :] = c_carry
        hseq_ref[0, sl, :] = h.astype(hseq_ref.dtype)
        cseq_ref[0, sl, :] = c_carry.astype(cseq_ref.dtype)
        gseq_ref[0, sl, :] = jnp.concatenate([iof, u], axis=-1).astype(
            gseq_ref.dtype
        )
        if drop > 0.0:
            # row_off keeps element indexing global: masks are invariant
            # to the n_split batch half-blocking knob
            keep = _keep_mask(seed_ref, t, h.shape, p * bs, _keep_u32(drop))
            inv = jnp.asarray(1.0 / (1.0 - drop), jnp.float32)
            hdrop_ref[0, sl, :] = jnp.where(keep, h * inv, 0.0).astype(
                hdrop_ref.dtype
            )


def _bwd_embed_fused_kernel(n, m, s, variant, cdtype, n_split, defer, drop,
                            *refs):
    """Reverse-time backward with the weight gradients accumulated
    *in-kernel*: dg never leaves VMEM. Per iteration t (timestep tau=s-1-t),
    the standard gate backward produces dg in registers; then
    ``dWU[:M] += onehot(ids_tau)^T @ dg``, ``dWU[M:] += h_{tau-1}^T @ dg``,
    and ``db += sum_b dg`` accumulate straight into the (constant-index)
    output blocks. At the headline config this removes the (S·B, 4N) dg
    stream entirely (write + two GEMM reads, ~150 MB per window).

    ``defer``: software-pipeline the wgrad accumulation one iteration back —
    iteration t accumulates the PREVIOUS iteration's dg (held in scratch)
    before computing this step's gate backward. The deferred wgrad GEMMs
    depend on nothing this iteration produces, so the scheduler may overlap
    them with the serialized VPU gate-backward chain (the kernel's measured
    residual cost, docs/PERFORMANCE.md round 2); the final iteration
    flushes its own dg inline. Same math, same per-timestep accumulation
    order — bitwise-identical gradients."""
    if drop > 0.0:
        (U_ref, gseq_ref, cseq_ref, cprev_ref, hprev_ref,
         c0_ref, h0_ref, ids_ref, seed_ref, dhseq_ref, dhT_ref, dcT_ref,
         dWU_ref, db_ref, dh0_ref, dc0_ref, dh_s, dc_s,
         *defer_scratch) = refs
    else:
        (U_ref, gseq_ref, cseq_ref, cprev_ref, hprev_ref,
         c0_ref, h0_ref, ids_ref, dhseq_ref, dhT_ref, dcT_ref,
         dWU_ref, db_ref, dh0_ref, dc0_ref, dh_s, dc_s,
         *defer_scratch) = refs
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_s[:] = dhT_ref[:].astype(jnp.float32)
        dc_s[:] = dcT_ref[:].astype(jnp.float32)
        dWU_ref[:] = jnp.zeros_like(dWU_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    b_sz = dh_s.shape[0]
    bs = b_sz // n_split
    cols = jax.lax.broadcasted_iota(jnp.int32, (b_sz, m), 1)

    def wgrad(dg_c, onehot, h_prev_c):
        dWU_ref[:m] += jax.lax.dot_general(
            onehot, dg_c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(cdtype),
        )
        dWU_ref[m:] += jax.lax.dot_general(
            h_prev_c, dg_c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(cdtype),
        )

    if defer:
        dg_s, hprev_s = defer_scratch

        # the previous iteration's accumulation: pure MXU work with no
        # dependence on anything below — issued first so it can overlap
        # the VPU gate backward
        @pl.when(t > 0)
        def _():
            ids_prev = ids_ref[s - t]              # prev iteration's tau
            onehot_prev = (cols == ids_prev[:, None]).astype(cdtype)
            wgrad(dg_s[:], onehot_prev, hprev_s[:])

    c_t_full = cseq_ref[0].astype(jnp.float32)
    is_first_step = t == s - 1     # timestep 0
    c_prev_full = jnp.where(
        is_first_step,
        c0_ref[:].astype(jnp.float32),
        cprev_ref[0].astype(jnp.float32),
    )
    dh_cot = dhseq_ref[0].astype(jnp.float32)
    if drop > 0.0:
        keep = _keep_mask(
            seed_ref, s - 1 - t, dh_cot.shape, 0, _keep_u32(drop)
        )
        inv = jnp.asarray(1.0 / (1.0 - drop), jnp.float32)
        dh_cot = jnp.where(keep, dh_cot * inv, 0.0)

    # per half-block: gate backward (VPU) then the CRITICAL-PATH dh GEMM
    # (MXU), interleaved so block p's GEMM can overlap block p+1's gate
    # backward; the weight-grad accumulations run after (they feed nothing
    # until the kernel ends)
    dgs_c = []
    db_acc = jnp.zeros((1, 4 * n), jnp.float32)
    for p in range(n_split):
        sl = slice(p * bs, (p + 1) * bs)
        g = gseq_ref[0, sl, :].astype(jnp.float32)
        dgs, dc_next = _gate_bwd(
            g[:, :n], g[:, n : 2 * n], g[:, 2 * n : 3 * n], g[:, 3 * n :],
            c_t_full[sl], c_prev_full[sl],
            dh_cot[sl] + dh_s[sl, :], dc_s[sl, :], variant,
        )
        dg = jnp.concatenate(dgs, axis=-1)
        db_acc = db_acc + jnp.sum(dg, axis=0, keepdims=True)
        dg_c = dg.astype(cdtype)
        dgs_c.append(dg_c)
        dh_s[sl, :] = jax.lax.dot_general(
            dg_c, U_ref[:].astype(cdtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(cdtype),
        )
        dc_s[sl, :] = dc_next

    dg_c = (
        dgs_c[0] if n_split == 1 else jnp.concatenate(dgs_c, axis=0)
    )
    h_prev = jnp.where(
        is_first_step,
        h0_ref[:].astype(jnp.float32),
        hprev_ref[0].astype(jnp.float32),
    )
    if defer:
        dg_s[:] = dg_c
        hprev_s[:] = h_prev.astype(cdtype)

        # last iteration: nothing comes after, flush this dg inline
        @pl.when(t == s - 1)
        def _():
            ids_t = ids_ref[s - 1 - t]
            onehot = (cols == ids_t[:, None]).astype(cdtype)
            wgrad(dg_c, onehot, h_prev.astype(cdtype))
    else:
        # weight-gradient accumulation (contraction over the B sublanes)
        ids_t = ids_ref[s - 1 - t]                         # (B,)
        onehot = (cols == ids_t[:, None]).astype(cdtype)
        wgrad(dg_c, onehot, h_prev.astype(cdtype))
    db_ref[:] += db_acc
    dh0_ref[:] = dh_s[:]
    dc0_ref[:] = dc_s[:]


def _bwd_embed_unroll2_kernel(n, m, s, variant, cdtype, n_split, drop, *refs):
    """Two-timestep-unrolled variant of ``_bwd_embed_fused_kernel`` (backward
    scheduling attempt 4, VERDICT r3 weak 5). Each grid iteration processes
    timesteps (tau1, tau0) = (s-1-2t, s-2-2t), and tau1's weight-gradient
    GEMMs are issued BETWEEN tau1's critical-path dh GEMM and tau0's VPU
    gate backward: they depend on nothing tau0 produces, so with in-order
    issue and asynchronous compute units the MXU can drain wgrad(tau1) while
    the VPU runs gate_bwd(tau0). Unlike the rejected deferred-wgrad schedule
    (r3 attempt 3) there is no scratch roundtrip — dg1 stays an SSA value
    inside the iteration. Same GEMMs, same per-timestep accumulation order:
    gradients bitwise identical to the unroll-1 kernel.
    Enable with ``EIGEN_LSTM_BWD_UNROLL=2`` (even S only)."""
    if drop > 0.0:
        (U_ref, gseq_ref, cseq_ref, cprev_ref, hcur_ref, hprev_ref,
         c0_ref, h0_ref, ids_ref, seed_ref, dhseq_ref, dhT_ref, dcT_ref,
         dWU_ref, db_ref, dh0_ref, dc0_ref, dh_s, dc_s) = refs
    else:
        (U_ref, gseq_ref, cseq_ref, cprev_ref, hcur_ref, hprev_ref,
         c0_ref, h0_ref, ids_ref, dhseq_ref, dhT_ref, dcT_ref,
         dWU_ref, db_ref, dh0_ref, dc0_ref, dh_s, dc_s) = refs
    t = pl.program_id(0)
    nb = s // 2

    @pl.when(t == 0)
    def _():
        dh_s[:] = dhT_ref[:].astype(jnp.float32)
        dc_s[:] = dcT_ref[:].astype(jnp.float32)
        dWU_ref[:] = jnp.zeros_like(dWU_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    b_sz = dh_s.shape[0]
    bs = b_sz // n_split
    cols = jax.lax.broadcasted_iota(jnp.int32, (b_sz, m), 1)

    def wgrad(dg_c, onehot, h_prev_c):
        dWU_ref[:m] += jax.lax.dot_general(
            onehot, dg_c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(cdtype),
        )
        dWU_ref[m:] += jax.lax.dot_general(
            h_prev_c, dg_c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(cdtype),
        )

    db_accs = []

    def substep(j, c_prev_full, tau):
        """Gate backward (VPU) + critical-path dh GEMM (MXU) for block row
        ``j``; advances dh_s/dc_s. Returns dg at the compute dtype."""
        c_t_full = cseq_ref[j].astype(jnp.float32)
        dh_cot = dhseq_ref[j].astype(jnp.float32)
        if drop > 0.0:
            keep = _keep_mask(seed_ref, tau, dh_cot.shape, 0, _keep_u32(drop))
            inv = jnp.asarray(1.0 / (1.0 - drop), jnp.float32)
            dh_cot = jnp.where(keep, dh_cot * inv, 0.0)
        dgs_c = []
        db_acc = jnp.zeros((1, 4 * n), jnp.float32)
        for p in range(n_split):
            sl = slice(p * bs, (p + 1) * bs)
            g = gseq_ref[j, sl, :].astype(jnp.float32)
            dgs, dc_next = _gate_bwd(
                g[:, :n], g[:, n : 2 * n], g[:, 2 * n : 3 * n], g[:, 3 * n :],
                c_t_full[sl], c_prev_full[sl],
                dh_cot[sl] + dh_s[sl, :], dc_s[sl, :], variant,
            )
            dg = jnp.concatenate(dgs, axis=-1)
            db_acc = db_acc + jnp.sum(dg, axis=0, keepdims=True)
            dg_c = dg.astype(cdtype)
            dgs_c.append(dg_c)
            dh_s[sl, :] = jax.lax.dot_general(
                dg_c, U_ref[:].astype(cdtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_prec(cdtype),
            )
            dc_s[sl, :] = dc_next
        db_accs.append(db_acc)
        return dgs_c[0] if n_split == 1 else jnp.concatenate(dgs_c, axis=0)

    # sub-step tau1 = s-1-2t: c_prev is in-block (c_{tau0})
    tau1 = s - 1 - 2 * t
    dg1 = substep(1, cseq_ref[0].astype(jnp.float32), tau1)
    # tau1's wgrad: independent of everything below — issue now so the MXU
    # drains it while the VPU runs tau0's gate backward
    ids1 = ids_ref[tau1]
    wgrad(dg1, (cols == ids1[:, None]).astype(cdtype),
          hcur_ref[0].astype(cdtype))

    # sub-step tau0 = s-2-2t: c_prev/h_prev come from the previous block
    # (position tau0-1 = block[1] of the shifted ref) or h0/c0 at tau0 == 0
    is_first = t == nb - 1
    c_prev0 = jnp.where(
        is_first, c0_ref[:].astype(jnp.float32),
        cprev_ref[1].astype(jnp.float32),
    )
    dg0 = substep(0, c_prev0, s - 2 - 2 * t)
    h_prev0 = jnp.where(
        is_first, h0_ref[:].astype(jnp.float32),
        hprev_ref[1].astype(jnp.float32),
    )
    ids0 = ids_ref[s - 2 - 2 * t]
    wgrad(dg0, (cols == ids0[:, None]).astype(cdtype),
          h_prev0.astype(cdtype))

    # two separate += in timestep order: bitwise-identical db to the
    # unroll-1 kernel's one-accumulation-per-iteration sequence
    db_ref[:] += db_accs[0]
    db_ref[:] += db_accs[1]
    dh0_ref[:] = dh_s[:]
    dc0_ref[:] = dc_s[:]


@functools.lru_cache(maxsize=64)
def _make_fused_embed_seq(s: int, b: int, n: int, m: int, variant: str,
                          cdtype_name: str, rdtype_name: str, interpret: bool,
                          n_split: int = 1, vma: tuple = (),
                          n_split_bwd: int = 1, defer_wgrad: bool = False,
                          drop: float = 0.0, unroll: int = 1):
    """custom-VJP fused layer-0 sequence op: (WU, b, ids, h0, c0) ->
    (h_seq, (hT, cT)). WU is the stacked (M+N, 4N) weight at the compute
    dtype; backward reuses the standard reverse-time kernel with U = WU[M:]
    and batches dW/dU/db into large GEMMs/sums outside.
    ``drop`` > 0: fused output dropout, see _make_fused_seq."""
    cdtype = jnp.dtype(cdtype_name).type
    rdtype = jnp.dtype(rdtype_name).type
    f32 = jnp.float32
    xdtype = jnp.bfloat16 if cdtype_name == "bfloat16" else f32
    base = _make_fused_seq(s, b, n, variant, cdtype_name, rdtype_name,
                           interpret, vma, drop)
    seed_spec = [pl.BlockSpec(memory_space=pltpu.SMEM)] if drop > 0.0 else []

    def fwd_call(WU, bvec, ids, h0, c0, seed=None):
        drop_out_specs, drop_out_shape = [], []
        if drop > 0.0:
            drop_out_specs = [
                pl.BlockSpec((1, b, n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
            ]
            drop_out_shape = [_sds((s, b, n), rdtype, vma)]
        return pl.pallas_call(
            functools.partial(
                _fwd_embed_kernel, n, m, variant, cdtype, n_split, drop
            ),
            grid=(s,),
            in_specs=[
                pl.BlockSpec((m + n, 4 * n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4 * n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                # the full (S, B) id matrix is tiny — keep it resident and
                # index by program_id (a (1, B) block violates Mosaic's
                # sublane tiling)
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ] + seed_spec,
            out_specs=[
                pl.BlockSpec((1, b, n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, 4 * n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            ] + drop_out_specs,
            out_shape=[
                _sds((s, b, n), rdtype, vma),
                _sds((s, b, n), rdtype, vma),
                _sds((s, b, 4 * n), rdtype, vma),
            ] + drop_out_shape,
            scratch_shapes=[
                pltpu.VMEM((b, n), f32),
                pltpu.VMEM((b, n), f32),
                pltpu.VMEM((b, m + n), cdtype),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * s * b * (m + n) * 4 * n,
                bytes_accessed=(
                    (m + n) * 4 * n * 4 + s * b * (4 + n * 4 * 2)
                ),
                transcendentals=s * b * 5 * n,
            ),
            interpret=interpret,
        )(*([WU, bvec, ids, h0, c0] + ([seed] if drop > 0.0 else [])))

    # in-kernel weight-grad accumulation needs the f32 dWU output block
    # resident alongside the bwd working set; gate by VMEM. The estimate is
    # conservative-ish (measured: the headline H=512 f32-residual case at an
    # estimated 15.5 MB compiles and runs); past the gate Mosaic fails with
    # a clean scoped-vmem compile error — use --residual-dtype bfloat16.
    rbytes = 2 if rdtype_name == "bfloat16" else 4
    fused_accum_ok = (
        (m + n) * 4 * n * 4                  # dWU f32 output block
        + n * 4 * n * (2 if cdtype_name == "bfloat16" else 4)   # U resident
        + 2 * b * 4 * n * rbytes             # gseq blocks (x2 buf)
        + 6 * b * n * rbytes                 # cseq/cprev/hprev blocks
        + 2 * b * n * 4                      # dhseq blocks
        + 6 * b * n * 4                      # c0/h0/dhT/dcT/dh_s/dc_s
    ) <= 16 * 1024 * 1024

    def bwd_fused_call(WU, g_seq, c_seq, h_seq, ids, h0, c0, dh_seq, dhT, dcT,
                       seed=None):
        smax = max(s - 2, 0)
        defer_scratch = (
            [pltpu.VMEM((b, 4 * n), cdtype), pltpu.VMEM((b, n), cdtype)]
            if defer_wgrad else []
        )
        return pl.pallas_call(
            functools.partial(
                _bwd_embed_fused_kernel, n, m, s, variant, cdtype,
                n_split_bwd, defer_wgrad, drop
            ),
            grid=(s,),
            in_specs=[
                pl.BlockSpec((n, 4 * n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, 4 * n), lambda t: (s - 1 - t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, n), lambda t: (s - 1 - t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, n), lambda t: (jnp.clip(s - 2 - t, 0, smax), 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, n), lambda t: (jnp.clip(s - 2 - t, 0, smax), 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),      # ids (S, B)
            ] + seed_spec + [
                pl.BlockSpec((1, b, n), lambda t: (s - 1 - t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((m + n, 4 * n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4 * n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                _sds((m + n, 4 * n), f32, vma),
                _sds((1, 4 * n), f32, vma),
                _sds((b, n), f32, vma),
                _sds((b, n), f32, vma),
            ],
            scratch_shapes=[
                pltpu.VMEM((b, n), f32),
                pltpu.VMEM((b, n), f32),
            ] + defer_scratch,
            cost_estimate=pl.CostEstimate(
                flops=2 * s * b * 4 * n * (2 * n + m + n),
                bytes_accessed=(
                    (m + 2 * n) * 4 * n * 4 + s * b * 4 * n * rbytes
                    + 4 * s * b * n * rbytes
                ),
                transcendentals=s * b * n,
            ),
            interpret=interpret,
        )(*([WU[m:], g_seq, c_seq, c_seq, h_seq, c0, h0, ids]
            + ([seed] if drop > 0.0 else []) + [dh_seq, dhT, dcT]))

    def _fwd_core(WU, bvec, ids, h0, c0, seed):
        outs = fwd_call(WU, bvec, ids, h0, c0, seed)
        if drop > 0.0:
            h_seq, c_seq, g_seq, hd_seq = outs
        else:
            h_seq, c_seq, g_seq = outs
            hd_seq = h_seq
        return h_seq, c_seq, g_seq, hd_seq

    # the unroll-2 kernel's per-iteration working set is larger: double-size
    # (2, b, ·) time blocks for g/c/dh plus two extra h streams (hcur,
    # hprev), all double-buffered — gate it separately so an oversized
    # config falls back to unroll-1 instead of a Mosaic scoped-vmem error
    unroll2_vmem_ok = (
        (m + n) * 4 * n * 4                                    # dWU f32 block
        + n * 4 * n * (2 if cdtype_name == "bfloat16" else 4)  # U resident
        + 2 * 2 * b * 4 * n * rbytes                           # gseq (2,b,4N) x2buf
        + 2 * 2 * b * n * rbytes * 4                           # cseq/cprev/hcur/hprev
        + 2 * 2 * b * n * 4                                    # dhseq f32 x2buf
        + 6 * b * n * 4                                        # c0/h0/dhT/dcT/dh_s/dc_s
    ) <= 16 * 1024 * 1024
    use_unroll2 = (
        unroll == 2 and s % 2 == 0 and not defer_wgrad and unroll2_vmem_ok
    )
    if unroll == 2 and not use_unroll2:
        # trace-time, once per (shape, config) via the lru_cache: an A/B
        # arm must be able to tell from its log that the knob fell back
        print(
            f"[pallas_cell] EIGEN_LSTM_BWD_UNROLL=2 requested but falling "
            f"back to unroll-1 (s={s} even={s % 2 == 0}, "
            f"defer={defer_wgrad}, vmem_ok={unroll2_vmem_ok})",
            flush=True,
        )

    def bwd_unroll2_call(WU, g_seq, c_seq, h_seq, ids, h0, c0, dh_seq,
                         dhT, dcT, seed=None):
        nb = s // 2
        pmax = max(nb - 2, 0)
        blk2 = lambda t: (nb - 1 - t, 0, 0)
        blk2_prev = lambda t: (jnp.clip(nb - 2 - t, 0, pmax), 0, 0)
        return pl.pallas_call(
            functools.partial(
                _bwd_embed_unroll2_kernel, n, m, s, variant, cdtype,
                n_split_bwd, drop
            ),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((n, 4 * n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, b, 4 * n), blk2, memory_space=pltpu.VMEM),
                pl.BlockSpec((2, b, n), blk2, memory_space=pltpu.VMEM),
                pl.BlockSpec((2, b, n), blk2_prev, memory_space=pltpu.VMEM),
                pl.BlockSpec((2, b, n), blk2, memory_space=pltpu.VMEM),
                pl.BlockSpec((2, b, n), blk2_prev, memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),      # ids (S, B)
            ] + seed_spec + [
                pl.BlockSpec((2, b, n), blk2, memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((m + n, 4 * n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4 * n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                _sds((m + n, 4 * n), f32, vma),
                _sds((1, 4 * n), f32, vma),
                _sds((b, n), f32, vma),
                _sds((b, n), f32, vma),
            ],
            scratch_shapes=[
                pltpu.VMEM((b, n), f32),
                pltpu.VMEM((b, n), f32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * s * b * 4 * n * (2 * n + m + n),
                bytes_accessed=(
                    (m + 2 * n) * 4 * n * 4 + s * b * 4 * n * rbytes
                    + 4 * s * b * n * rbytes
                ),
                transcendentals=s * b * n,
            ),
            interpret=interpret,
        )(*([WU[m:], g_seq, c_seq, c_seq, h_seq, h_seq, c0, h0, ids]
            + ([seed] if drop > 0.0 else []) + [dh_seq, dhT, dcT]))

    def _bwd_core(res, cot):
        WU, h_seq, c_seq, g_seq, ids, h0, c0, seed = res
        dh_seq, (dhT, dcT) = cot
        if fused_accum_ok:
            call = bwd_unroll2_call if use_unroll2 else bwd_fused_call
            dWU, db, dh0, dc0 = call(
                WU, g_seq, c_seq, h_seq, ids.astype(jnp.int32),
                h0.astype(jnp.float32), c0.astype(jnp.float32),
                dh_seq.astype(jnp.float32),
                dhT.astype(jnp.float32), dcT.astype(jnp.float32), seed,
            )
            return (
                dWU.astype(WU.dtype), db, None,
                dh0.astype(h0.dtype), dc0.astype(c0.dtype),
            )
        U = WU[m:]
        # fall back: reverse-time kernel emits dg, weight grads as GEMMs
        dg_seq, dh0, dc0 = base.bwd_call(
            U, g_seq, c_seq, c0.astype(jnp.float32),
            dh_seq.astype(jnp.float32),
            dhT.astype(jnp.float32), dcT.astype(jnp.float32), seed,
        )
        dg_flat = dg_seq.reshape(s * b, 4 * n)
        # dU = h_prev^T dg ; dW = onehot(ids)^T dg — both as single GEMMs
        h_prev = jnp.concatenate(
            [h0[None].astype(h_seq.dtype), h_seq[:-1]], axis=0
        ).reshape(s * b, n)
        onehot = jax.nn.one_hot(ids.reshape(s * b), m, dtype=cdtype)
        dW = jax.lax.dot_general(
            onehot, dg_flat.astype(cdtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_prec(cdtype),
        )
        dU = jax.lax.dot_general(
            h_prev.astype(cdtype), dg_flat.astype(cdtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_prec(cdtype),
        )
        dWU = jnp.concatenate([dW, dU], axis=0).astype(WU.dtype)
        db = jnp.sum(dg_flat.astype(f32), axis=0, keepdims=True)
        return (dWU, db, None, dh0.astype(h0.dtype), dc0.astype(c0.dtype))

    if drop > 0.0:
        @jax.custom_vjp
        def fused_embed_seq(WU, bvec, ids, h0, c0, seed):
            h_seq, c_seq, _, hd_seq = _fwd_core(WU, bvec, ids, h0, c0, seed)
            return hd_seq, (h_seq[s - 1], c_seq[s - 1])

        def fwd(WU, bvec, ids, h0, c0, seed):
            h_seq, c_seq, g_seq, hd_seq = _fwd_core(WU, bvec, ids, h0, c0, seed)
            out = (hd_seq, (h_seq[s - 1], c_seq[s - 1]))
            return out, (WU, h_seq, c_seq, g_seq, ids, h0, c0, seed)

        def bwd(res, cot):
            return _bwd_core(res, cot) + (None,)
    else:
        @jax.custom_vjp
        def fused_embed_seq(WU, bvec, ids, h0, c0):
            h_seq, c_seq, _, _ = _fwd_core(WU, bvec, ids, h0, c0, None)
            return h_seq, (h_seq[s - 1], c_seq[s - 1])

        def fwd(WU, bvec, ids, h0, c0):
            h_seq, c_seq, g_seq, _ = _fwd_core(WU, bvec, ids, h0, c0, None)
            out = (h_seq, (h_seq[s - 1], c_seq[s - 1]))
            return out, (WU, h_seq, c_seq, g_seq, ids, h0, c0, None)

        def bwd(res, cot):
            return _bwd_core(res, cot)

    fused_embed_seq.defvjp(fwd, bwd)
    return fused_embed_seq


def embed_supported(cfg: ModelConfig, batch: int) -> bool:
    """VMEM gate for the fused-embedding layer-0 kernel: the stacked
    (M+N, 4N) weight must fit alongside the working set."""
    n, m = cfg.hidden, cfg.vocab
    if n % 128 != 0 or m % 128 != 0 or batch % 8 != 0:
        return False
    bytes_per = 2 if cfg.compute_dtype == "bfloat16" else 4
    # 12 MB leaves ~4 MB of the ~16 MB VMEM for the per-step blocks and
    # scratch; N=1024 bf16 ((256+1024)*4096*2 = 10.5 MB) fits and measures
    # 1.41x faster than the xw-stream kernel
    return (m + n) * 4 * n * bytes_per <= 12 * 1024 * 1024


def pallas_embed_layer0(layer, ids, h0, c0, cfg: ModelConfig, n_split=None,
                        dropout=None):
    """Layer-0 recurrence with the embedding fused into the kernel.
    ids: (S, B) int32. Same return contract as pallas_scan_layer.
    ``n_split``: batch half-blocking for epilogue/MXU overlap (default from
    EIGEN_LSTM_BSPLIT, else 1).
    ``dropout``: optional ``(rate, seed)`` fused output dropout."""
    import os

    s, b = ids.shape
    n, m = cfg.hidden, cfg.vocab
    if n_split is None:
        n_split = int(os.environ.get("EIGEN_LSTM_BSPLIT", "1"))
    if b % (8 * n_split) != 0:
        n_split = 1
    n_split_bwd = int(os.environ.get("EIGEN_LSTM_BSPLIT_BWD", "1"))
    if b % (8 * n_split_bwd) != 0:
        n_split_bwd = 1
    # software-pipelined weight-grad accumulation (dg deferred one
    # iteration so its MXU GEMMs may overlap the next VPU gate backward)
    defer_wgrad = os.environ.get("EIGEN_LSTM_BWD_DEFER", "0") == "1"
    # two-timestep backward unroll (attempt 4 — see _bwd_embed_unroll2_kernel)
    unroll = int(os.environ.get("EIGEN_LSTM_BWD_UNROLL", "1"))
    drop, seed = dropout if dropout is not None else (0.0, None)
    fn = _make_fused_embed_seq(
        s, b, n, m, cfg.cell_variant, jnp.dtype(cfg.cdtype).name,
        jnp.dtype(jnp.float32 if cfg.residual_dtype == "float32" else jnp.bfloat16).name,
        _use_interpret(), n_split, _vma_of(layer.W, layer.U, ids, h0, c0),
        n_split_bwd, defer_wgrad, float(drop), unroll,
    )
    WU = jnp.concatenate([layer.W, layer.U], axis=0).astype(cfg.cdtype)
    bvec = layer.b.astype(jnp.float32).reshape(1, 4 * n)
    args = (
        WU, bvec, ids.astype(jnp.int32),
        h0.astype(jnp.float32), c0.astype(jnp.float32),
    )
    if drop > 0.0:
        h_seq, (hT, cT) = fn(*args, seed)
    else:
        h_seq, (hT, cT) = fn(*args)
    return h_seq, (hT.astype(cfg.pdtype), cT.astype(cfg.pdtype))
