"""Tiled-U Pallas kernel: the LSTM sequence recurrence for models whose
recurrent weight no longer fits VMEM (N >= 2048 bf16, N >= 1024 fp32).

Regime analysis (why this kernel exists): at N=2048/B=128 the per-step MXU
work is 2·B·N·4N ≈ 4.3 GFLOP (~22 µs at v5e bf16 peak) while U itself is
N·4N·2 B = 32 MB — streaming it from HBM costs ~39 µs at ~819 GB/s. The
step is therefore HBM-bandwidth-bound on U, and the kernel's entire job is
to stream U in tiles, double-buffered, with the DMA fully overlapped by the
matmul — which the XLA while-loop lowering does not achieve (round-1
BENCHMARKS row 5: 30.4% MFU). The resident-U kernel (ops/pallas_cell.py)
stays the right choice whenever U fits; dispatch.py picks per config.

Design:
* forward grid (S, K): K tiles of width ``wt = 4N/K`` along the gate axis.
  The U tile (N, wt) block-spec index depends on k, so Pallas's pipeline
  prefetches tile k+1 while tile k multiplies. Each chunk lies inside one
  gate (wt divides N), so its activation (σ for i,o,f; tanh for u) is
  applied per-chunk and written straight to the saved-gates output; the
  cell/state epilogue runs once per step at k = K-1 from a VMEM scratch
  holding the activated row.
* backward grid (S+1, K), reverse time, software-pipelined one step deep:
  the epilogue at (j, K-1) computes dg for timestep τ = S-1-j; the K tile
  iterations of row j+1 then accumulate ``dh_{τ-1} += dg_τ[:, tile k] @
  U_tile^T`` while streaming the same U tiles they need anyway, and write
  dg_τ's chunks to HBM. Row S exists only to flush dg for τ=0. dh0 and the
  weight gradient dU are single large MXU GEMMs outside the kernel (as in
  the resident kernel).

Parity: validated against the jnp oracle and the resident kernel in
tests/test_pallas_cell_tiled.py (the lockstep-cross-validation discipline of
``lstm_eigen_CUDA/lstm.cu:425-496``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from .pallas_cell import _cell_fwd, _gate_bwd, _prec, _use_interpret

VMEM_BUDGET = 14 * 1024 * 1024   # leave ~2 MB of the ~16 MB VMEM for Mosaic


def _fwd_tiled_kernel(n, k_tiles, wt, variant, cdtype,
                      U_ref, xw_ref, h0_ref, c0_ref,
                      hseq_ref, cseq_ref, gseq_ref,
                      h_s, c_s, h_c, g_s):
    t = pl.program_id(0)
    k = pl.program_id(1)
    cpg = n // wt                     # chunks per gate

    @pl.when((t == 0) & (k == 0))
    def _():
        h_s[:] = h0_ref[:].astype(jnp.float32)
        c_s[:] = c0_ref[:].astype(jnp.float32)

    @pl.when(k == 0)
    def _():
        # cache h_{t-1} in the compute dtype once per step
        h_c[:] = h_s[:].astype(cdtype)

    pre = xw_ref[0].astype(jnp.float32) + jnp.dot(
        h_c[:], U_ref[:].astype(cdtype), preferred_element_type=jnp.float32,
        precision=_prec(cdtype),
    )
    is_u = k >= 3 * cpg               # chunk lies in the candidate gate
    act = jnp.where(is_u, jnp.tanh(pre), jax.nn.sigmoid(pre))
    g_s[k] = act
    gseq_ref[0] = act.astype(gseq_ref.dtype)

    @pl.when(k == k_tiles - 1)
    def _():
        # the cell update is elementwise per hidden unit, so it decomposes
        # into per-slice passes with only (B, wt)-sized temporaries — a full
        # (B, 4N) f32 row would blow Mosaic's scoped-VMEM stack at N=2048
        for kk in range(cpg):
            sl = slice(kk * wt, (kk + 1) * wt)
            h, c_carry = _cell_fwd(
                g_s[kk], g_s[cpg + kk], g_s[2 * cpg + kk], g_s[3 * cpg + kk],
                c_s[:, sl], variant,
            )
            h_s[:, sl] = h
            c_s[:, sl] = c_carry
            hseq_ref[0, :, sl] = h.astype(hseq_ref.dtype)
            cseq_ref[0, :, sl] = c_carry.astype(cseq_ref.dtype)


def _bwd_tiled_kernel(n, s, k_tiles, wt, variant, cdtype,
                      U_ref, gseq_ref, cseq_ref, cprev_ref, c0_ref,
                      dhseq_ref, dhT_ref, dcT_ref,
                      dgseq_ref, dc0_ref,
                      g_s, dg_s, dh_acc, dc_s):
    j = pl.program_id(0)               # row j handles timestep tau = s-1-j;
    k = pl.program_id(1)               # row s only flushes dg for tau = 0
    cpg = n // wt

    @pl.when((j == 0) & (k == 0))
    def _():
        dc_s[:] = dcT_ref[:].astype(jnp.float32)

    @pl.when(k == 0)
    def _():
        dh_acc[:] = jnp.zeros_like(dh_acc)

    @pl.when(j > 0)
    def _():
        # dg of step tau+1 (left in dg_s by row j-1's epilogue): accumulate
        # its dh contribution and flush its chunk to HBM
        dg_k = dg_s[k]
        dh_acc[:] += jax.lax.dot_general(
            dg_k.astype(cdtype), U_ref[:].astype(cdtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(cdtype),
        )
        dgseq_ref[0] = dg_k.astype(dgseq_ref.dtype)

    @pl.when(j < s)
    def _():
        g_s[k] = gseq_ref[0].astype(g_s.dtype)

    @pl.when((k == k_tiles - 1) & (j < s))
    def _():
        # per-slice epilogue (see forward kernel): only (B, wt) temporaries
        is_first_step = j == s - 1     # timestep 0
        for kk in range(cpg):
            sl = slice(kk * wt, (kk + 1) * wt)
            i = g_s[kk].astype(jnp.float32)
            o = g_s[cpg + kk].astype(jnp.float32)
            f = g_s[2 * cpg + kk].astype(jnp.float32)
            u = g_s[3 * cpg + kk].astype(jnp.float32)
            c_t = cseq_ref[0, :, sl].astype(jnp.float32)
            c_prev = jnp.where(
                is_first_step,
                c0_ref[:, sl].astype(jnp.float32),
                cprev_ref[0, :, sl].astype(jnp.float32),
            )
            dh_carried = jnp.where(
                j == 0, dhT_ref[:, sl].astype(jnp.float32), dh_acc[:, sl]
            )
            dh_total = dhseq_ref[0, :, sl].astype(jnp.float32) + dh_carried
            dgs, dc_next = _gate_bwd(
                i, o, f, u, c_t, c_prev, dh_total, dc_s[:, sl], variant
            )
            for gi, dg_slice in enumerate(dgs):
                dg_s[gi * cpg + kk] = dg_slice.astype(dg_s.dtype)
            dc_s[:, sl] = dc_next
            dc0_ref[:, sl] = dc_s[:, sl]    # last-write-wins at j = s-1


def pick_tile_width(n: int, b: int, cdtype_name: str, rdtype_name: str) -> int:
    """Largest wt in {512, 256, 128} dividing N whose worst-phase (backward)
    VMEM footprint fits the budget; 0 if none does."""
    cbytes = 2 if cdtype_name == "bfloat16" else 4
    rbytes = 2 if rdtype_name == "bfloat16" else 4
    for wt in (512, 256, 128):
        if n % wt != 0:
            continue
        bwd = (
            2 * n * wt * cbytes            # U tile, double-buffered
            + b * 4 * n * rbytes           # g_s scratch (activated row)
            + b * 4 * n * cbytes           # dg_s scratch (xw dtype — the
            # resident kernel also feeds compute-dtype dg into the dh chain)
            + 2 * b * n * 4                # dh_acc + dc_s
            + 2 * 2 * b * n * rbytes       # cseq + cprev blocks (x2 buf)
            + 2 * b * n * cbytes           # dh_seq cotangent blocks
            + 3 * b * n * 4                # c0, dhT, dcT
            + 4 * b * wt * (rbytes + cbytes)   # g chunk in + dg chunk out
        )
        fwd = (
            2 * n * wt * cbytes
            + b * 4 * n * 4                # g_s scratch (f32)
            + 2 * b * n * 4 + b * n * cbytes   # h_s, c_s, h_c
            + 2 * 2 * b * n * rbytes       # hseq + cseq out blocks
            + 4 * b * wt * (cbytes + rbytes)   # xw in + gseq out chunks
            + 2 * b * n * 4                # h0, c0
        )
        if max(fwd, bwd) <= VMEM_BUDGET:
            return wt
    return 0


@functools.lru_cache(maxsize=64)
def _make_tiled_seq(s: int, b: int, n: int, wt: int, variant: str,
                    cdtype_name: str, rdtype_name: str, interpret: bool):
    """Build the custom-VJP tiled sequence op for static (S, B, N, wt)."""
    cdtype = jnp.dtype(cdtype_name).type
    rdtype = jnp.dtype(rdtype_name).type
    f32 = jnp.float32
    xdtype = jnp.bfloat16 if cdtype_name == "bfloat16" else f32
    k_tiles = 4 * n // wt
    assert n % wt == 0, (n, wt)

    def fwd_call(U, xw, h0, c0):
        return pl.pallas_call(
            functools.partial(_fwd_tiled_kernel, n, k_tiles, wt, variant, cdtype),
            grid=(s, k_tiles),
            in_specs=[
                pl.BlockSpec((n, wt), lambda t, k: (0, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, wt), lambda t, k: (t, 0, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t, k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, b, n), lambda t, k: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, n), lambda t, k: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, wt), lambda t, k: (t, 0, k), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((s, b, n), rdtype),
                jax.ShapeDtypeStruct((s, b, n), rdtype),
                jax.ShapeDtypeStruct((s, b, 4 * n), rdtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((b, n), f32),           # h carry
                pltpu.VMEM((b, n), f32),           # c carry
                pltpu.VMEM((b, n), cdtype),        # h cast cache
                pltpu.VMEM((k_tiles, b, wt), f32),  # activated-gate row
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * s * b * n * 4 * n,
                bytes_accessed=(
                    s * n * 4 * n * (2 if cdtype_name == "bfloat16" else 4)
                    + s * b * 4 * n * 2 * (2 if rdtype_name == "bfloat16" else 4)
                ),
                transcendentals=2 * s * b * 4 * n,
            ),
            interpret=interpret,
        )(U, xw, h0, c0)

    def bwd_call(U, g_seq, c_seq, c0, dh_seq, dhT, dcT):
        smax = s - 1

        def dg_index(j, k):
            # row j flushes dg of timestep s-j (row 0 writes nothing; its
            # slot s-1 is rewritten by row 1 — consecutive revisit)
            return (jnp.clip(s - j, 0, smax), 0, k)

        return pl.pallas_call(
            functools.partial(
                _bwd_tiled_kernel, n, s, k_tiles, wt, variant, cdtype
            ),
            grid=(s + 1, k_tiles),
            in_specs=[
                pl.BlockSpec((n, wt), lambda j, k: (0, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, wt), lambda j, k: (jnp.clip(s - 1 - j, 0, smax), 0, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, n), lambda j, k: (jnp.clip(s - 1 - j, 0, smax), 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, n), lambda j, k: (jnp.clip(s - 2 - j, 0, smax), 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda j, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, n), lambda j, k: (jnp.clip(s - 1 - j, 0, smax), 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda j, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda j, k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, b, wt), dg_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda j, k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((s, b, 4 * n), xdtype),
                jax.ShapeDtypeStruct((b, n), f32),
            ],
            scratch_shapes=[
                pltpu.VMEM((k_tiles, b, wt), rdtype),  # gate row
                pltpu.VMEM((k_tiles, b, wt), xdtype),  # dg row
                pltpu.VMEM((b, n), f32),               # dh accumulator
                pltpu.VMEM((b, n), f32),               # dc carry
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * s * b * n * 4 * n,
                bytes_accessed=(
                    s * n * 4 * n * (2 if cdtype_name == "bfloat16" else 4)
                    + s * b * 4 * n * 2 * (2 if rdtype_name == "bfloat16" else 4)
                ),
                transcendentals=s * b * n,
            ),
            interpret=interpret,
        )(U, g_seq, c_seq, c_seq, c0, dh_seq, dhT, dcT)

    @jax.custom_vjp
    def tiled_seq(U, xw, h0, c0):
        h_seq, c_seq, _ = fwd_call(U, xw, h0, c0)
        return h_seq, (h_seq[s - 1], c_seq[s - 1])

    def tiled_seq_fwd(U, xw, h0, c0):
        h_seq, c_seq, g_seq = fwd_call(U, xw, h0, c0)
        out = (h_seq, (h_seq[s - 1], c_seq[s - 1]))
        return out, (U, h_seq, c_seq, g_seq, h0, c0)

    def tiled_seq_bwd(res, cot):
        U, h_seq, c_seq, g_seq, h0, c0 = res
        dh_seq, (dhT, dcT) = cot
        dg_seq, dc0 = bwd_call(
            U, g_seq, c_seq, c0.astype(jnp.float32),
            dh_seq.astype(xdtype),
            dhT.astype(jnp.float32), dcT.astype(jnp.float32),
        )
        # dh0 = dg_0 @ U^T — the one step the pipelined kernel doesn't chain
        dh0 = jax.lax.dot_general(
            dg_seq[0].astype(cdtype), U.astype(cdtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=_prec(cdtype),
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
            dg_seq,                       # d(xw)
            dh0.astype(h0.dtype),
            dc0.astype(c0.dtype),
        )

    tiled_seq.defvjp(tiled_seq_fwd, tiled_seq_bwd)
    return tiled_seq


def pallas_tiled_scan_layer(layer, xw, h0, c0, cfg: ModelConfig, wt=None):
    """Drop-in ``cell_fn`` for ``models.lstm.forward`` — same contract as
    ``pallas_cell.pallas_scan_layer`` but with U streamed in tiles."""
    s, b, _ = xw.shape
    n = cfg.hidden
    rdtype_name = "float32" if cfg.residual_dtype == "float32" else "bfloat16"
    if wt is None:
        wt = pick_tile_width(n, b, jnp.dtype(cfg.cdtype).name, rdtype_name)
    if not wt:
        raise ValueError(f"no tile width fits VMEM for N={n}, B={b}")
    fn = _make_tiled_seq(
        s, b, n, wt, cfg.cell_variant, jnp.dtype(cfg.cdtype).name,
        rdtype_name, _use_interpret(),
    )
    xdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    h_seq, (hT, cT) = fn(
        layer.U.astype(cfg.cdtype), xw.astype(xdtype),
        h0.astype(jnp.float32), c0.astype(jnp.float32),
    )
    return h_seq, (hT.astype(cfg.pdtype), cT.astype(cfg.pdtype))
