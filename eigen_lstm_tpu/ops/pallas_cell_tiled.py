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
from .pallas_cell import (
    _cell_fwd, _gate_bwd, _keep_mask, _keep_u32, _prec, _sds, _use_interpret,
    _vma_of,
)

VMEM_BUDGET = 14 * 1024 * 1024   # leave ~2 MB of the ~16 MB VMEM for Mosaic


def _fwd_tiled_kernel(n, k_tiles, wt, variant, cdtype, drop, *refs):
    if drop > 0.0:
        (U_ref, xw_ref, h0_ref, c0_ref, seed_ref,
         hseq_ref, cseq_ref, gseq_ref, hdrop_ref, h_s, c_s, h_c, g_s) = refs
    else:
        (U_ref, xw_ref, h0_ref, c0_ref,
         hseq_ref, cseq_ref, gseq_ref, h_s, c_s, h_c, g_s) = refs
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

    pre = xw_ref[0, 0].astype(jnp.float32) + jnp.dot(
        h_c[:], U_ref[0], preferred_element_type=jnp.float32,
        precision=_prec(cdtype),
    )
    is_u = k >= 3 * cpg               # chunk lies in the candidate gate
    act = jnp.where(is_u, jnp.tanh(pre), jax.nn.sigmoid(pre))
    g_s[k] = act
    gseq_ref[0, 0] = act.astype(gseq_ref.dtype)

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
            if drop > 0.0:
                keep = _keep_mask(seed_ref, t, h.shape, 0, _keep_u32(drop),
                                  col_off=kk * wt, n_total=n)
                inv = jnp.asarray(1.0 / (1.0 - drop), jnp.float32)
                hdrop_ref[0, :, sl] = jnp.where(keep, h * inv, 0.0).astype(
                    hdrop_ref.dtype
                )


def _bwd_tiled_kernel(n, s, k_tiles, wt, variant, cdtype, drop, *refs):
    if drop > 0.0:
        (U_ref, gseq_ref, cseq_ref, cprev_ref, c0_ref, seed_ref,
         dhseq_ref, dhT_ref, dcT_ref,
         dgseq_ref, dc0_ref, g_s, dg_s, dh_acc, dc_s) = refs
    else:
        (U_ref, gseq_ref, cseq_ref, cprev_ref, c0_ref,
         dhseq_ref, dhT_ref, dcT_ref,
         dgseq_ref, dc0_ref, g_s, dg_s, dh_acc, dc_s) = refs
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
            dg_k.astype(cdtype), U_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(cdtype),
        )
        dgseq_ref[0, 0] = dg_k.astype(dgseq_ref.dtype)

    @pl.when(j < s)
    def _():
        g_s[k] = gseq_ref[0, 0].astype(g_s.dtype)

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
            dh_cot = dhseq_ref[0, :, sl].astype(jnp.float32)
            if drop > 0.0:
                keep = _keep_mask(
                    seed_ref, s - 1 - j, dh_cot.shape, 0, _keep_u32(drop),
                    col_off=kk * wt, n_total=n,
                )
                inv = jnp.asarray(1.0 / (1.0 - drop), jnp.float32)
                dh_cot = jnp.where(keep, dh_cot * inv, 0.0)
            dh_total = dh_cot + dh_carried
            dgs, dc_next = _gate_bwd(
                i, o, f, u, c_t, c_prev, dh_total, dc_s[:, sl], variant
            )
            for gi, dg_slice in enumerate(dgs):
                dg_s[gi * cpg + kk] = dg_slice.astype(dg_s.dtype)
            dc_s[:, sl] = dc_next
            dc0_ref[:, sl] = dc_s[:, sl]    # last-write-wins at j = s-1


def pick_tile_width(n: int, b: int, cdtype_name: str, rdtype_name: str,
                    drop: bool = False) -> int:
    """Largest wt in {512, 256, 128} dividing N whose worst-phase (backward)
    VMEM footprint fits the budget; 0 if none does. ``drop`` adds the fused
    dropout's double-buffered masked-output block to the forward budget."""
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
            + (2 * b * n * rbytes if drop else 0)   # hdrop out blocks (x2)
        )
        if max(fwd, bwd) <= VMEM_BUDGET:
            return wt
    return 0


@functools.lru_cache(maxsize=64)
def _make_tiled_seq(s: int, b: int, n: int, wt: int, variant: str,
                    cdtype_name: str, rdtype_name: str, interpret: bool,
                    vma: tuple = (), drop: float = 0.0):
    """Build the custom-VJP tiled sequence op for static (S, B, N, wt).
    ``drop`` > 0: fused output dropout (see pallas_cell._make_fused_seq) —
    identical mask bits to the resident kernels (global element indexing)."""
    cdtype = jnp.dtype(cdtype_name).type
    rdtype = jnp.dtype(rdtype_name).type
    f32 = jnp.float32
    xdtype = jnp.bfloat16 if cdtype_name == "bfloat16" else f32
    k_tiles = 4 * n // wt
    assert n % wt == 0, (n, wt)
    seed_spec = [pl.BlockSpec(memory_space=pltpu.SMEM)] if drop > 0.0 else []

    def _tile_u(U):
        # (n, 4n) -> (k_tiles, n, wt): one XLA transpose per step (~2r+w of
        # 2·n·4n bytes, trivial next to streaming U S times)
        return U.reshape(n, k_tiles, wt).transpose(1, 0, 2)

    def fwd_call(U, xw, h0, c0, seed=None):
        # U pre-tiled (k_tiles, n, wt) and xw/gseq in (.., k_tiles, b, wt)
        # layouts so every tile DMA is one contiguous transfer — an (n, wt)
        # column slice of the row-major (n, 4n) layout is n strided wt-wide
        # reads, which measures ~15% slower end-to-end at N=2048
        # (docs/PERFORMANCE.md round 2c)
        U = _tile_u(U)
        xw = xw.reshape(s, b, k_tiles, wt).transpose(0, 2, 1, 3)
        drop_out_specs, drop_out_shape = [], []
        if drop > 0.0:
            drop_out_specs = [
                pl.BlockSpec((1, b, n), lambda t, k: (t, 0, 0), memory_space=pltpu.VMEM)
            ]
            drop_out_shape = [_sds((s, b, n), rdtype, vma)]
        return pl.pallas_call(
            functools.partial(
                _fwd_tiled_kernel, n, k_tiles, wt, variant, cdtype, drop
            ),
            grid=(s, k_tiles),
            in_specs=[
                pl.BlockSpec((1, n, wt), lambda t, k: (k, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, b, wt), lambda t, k: (t, k, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t, k: (0, 0), memory_space=pltpu.VMEM),
            ] + seed_spec,
            out_specs=[
                pl.BlockSpec((1, b, n), lambda t, k: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, n), lambda t, k: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, b, wt), lambda t, k: (t, k, 0, 0), memory_space=pltpu.VMEM),
            ] + drop_out_specs,
            out_shape=[
                _sds((s, b, n), rdtype, vma),
                _sds((s, b, n), rdtype, vma),
                _sds((s, k_tiles, b, wt), rdtype, vma),
            ] + drop_out_shape,
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
        )(*([U, xw, h0, c0] + ([seed] if drop > 0.0 else [])))

    def bwd_call(U, g_seq, c_seq, c0, dh_seq, dhT, dcT, seed=None):
        U = _tile_u(U)
        smax = s - 1

        def dg_index(j, k):
            # row j flushes dg of timestep s-j (row 0 writes nothing; its
            # slot s-1 is rewritten by row 1 — consecutive revisit)
            return (jnp.clip(s - j, 0, smax), k, 0, 0)

        return pl.pallas_call(
            functools.partial(
                _bwd_tiled_kernel, n, s, k_tiles, wt, variant, cdtype, drop
            ),
            grid=(s + 1, k_tiles),
            in_specs=[
                pl.BlockSpec((1, n, wt), lambda j, k: (k, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, b, wt), lambda j, k: (jnp.clip(s - 1 - j, 0, smax), k, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, n), lambda j, k: (jnp.clip(s - 1 - j, 0, smax), 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, n), lambda j, k: (jnp.clip(s - 2 - j, 0, smax), 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda j, k: (0, 0), memory_space=pltpu.VMEM),
            ] + seed_spec + [
                pl.BlockSpec((1, b, n), lambda j, k: (jnp.clip(s - 1 - j, 0, smax), 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda j, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda j, k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, b, wt), dg_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda j, k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                _sds((s, k_tiles, b, wt), xdtype, vma),
                _sds((b, n), f32, vma),
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
        # dg arrives in the kernel's tiled (S, K, B, wt) layout; all its
        # consumers contract with dot_generals that keep that layout (no
        # 4N-wide transpose of the largest gradient stream)
        dg_t = bwd_call(
            U, g_seq, c_seq, c0.astype(jnp.float32),
            dh_seq.astype(xdtype),
            dhT.astype(jnp.float32), dcT.astype(jnp.float32), seed,
        )
        dg_seq, dc0 = dg_t
        # dh0 = dg_0 @ U^T — the one step the pipelined kernel doesn't chain
        dh0 = jax.lax.dot_general(
            dg_seq[0].astype(cdtype), _tile_u(U.astype(cdtype)),
            dimension_numbers=(((0, 2), (0, 2)), ((), ())),
            preferred_element_type=f32, precision=_prec(cdtype),
        )
        # dU[n, k, wt] = sum_{t,b} h_prev[t,b,n] dg[t,k,b,wt] — per-tile
        # MXU GEMMs over all steps, reshaped back to the canonical (N, 4N)
        h_prev = jnp.concatenate([h0[None].astype(h_seq.dtype), h_seq[:-1]], axis=0)
        dU = jax.lax.dot_general(
            h_prev.astype(cdtype),
            dg_seq.astype(cdtype),
            dimension_numbers=(((0, 1), (0, 2)), ((), ())),
            preferred_element_type=f32, precision=_prec(cdtype),
        ).reshape(n, 4 * n)
        # d(xw) in the caller's (S, B, 4N) layout
        dxw = dg_seq.transpose(0, 2, 1, 3).reshape(s, b, 4 * n)
        return (
            dU.astype(U.dtype),
            dxw,
            dh0.astype(h0.dtype),
            dc0.astype(c0.dtype),
        )

    if drop > 0.0:
        # masked primary output; the carried (hT, cT) stay unmasked, and the
        # backward regenerates the mask from (seed, timestep) — exactly the
        # resident _make_fused_seq contract
        @jax.custom_vjp
        def tiled_seq(U, xw, h0, c0, seed):
            h_seq, c_seq, _, hd_seq = _fwd_core(U, xw, h0, c0, seed)
            return hd_seq, (h_seq[s - 1], c_seq[s - 1])

        def tiled_seq_fwd(U, xw, h0, c0, seed):
            h_seq, c_seq, g_seq, hd_seq = _fwd_core(U, xw, h0, c0, seed)
            out = (hd_seq, (h_seq[s - 1], c_seq[s - 1]))
            return out, (U, h_seq, c_seq, g_seq, h0, c0, seed)

        def tiled_seq_bwd(res, cot):
            return _bwd_core(res, cot) + (None,)
    else:
        @jax.custom_vjp
        def tiled_seq(U, xw, h0, c0):
            h_seq, c_seq, _, _ = _fwd_core(U, xw, h0, c0, None)
            return h_seq, (h_seq[s - 1], c_seq[s - 1])

        def tiled_seq_fwd(U, xw, h0, c0):
            h_seq, c_seq, g_seq, _ = _fwd_core(U, xw, h0, c0, None)
            out = (h_seq, (h_seq[s - 1], c_seq[s - 1]))
            return out, (U, h_seq, c_seq, g_seq, h0, c0, None)

        def tiled_seq_bwd(res, cot):
            return _bwd_core(res, cot)

    tiled_seq.defvjp(tiled_seq_fwd, tiled_seq_bwd)
    tiled_seq.bwd_call = bwd_call   # reused by the tiled-embed variant
    return tiled_seq


# ---------------------------------------------------------------------------
# Tiled-embed variant (layer 0): the per-step input contribution W·x is
# computed INSIDE the kernel — onehot(ids) concatenated with h_{t-1} against
# tiles of the stacked [W; U] — eliminating the precomputed xw stream
# ((S·B, 4N), the largest HBM stream of the tiled regime) exactly as the
# resident fused-embed kernel does for models whose U fits VMEM
# (pallas_cell.py). The extra B·M·wt MXU FLOPs per tile ride under the
# U-tile DMA (the regime is HBM-bound on U, module docstring).
# ---------------------------------------------------------------------------


def _fwd_tiled_embed_kernel(n, m, k_tiles, wt, variant, cdtype, drop, *refs):
    if drop > 0.0:
        (WU_ref, b_ref, ids_ref, h0_ref, c0_ref, seed_ref,
         hseq_ref, cseq_ref, gseq_ref, hdrop_ref, h_s, c_s, xh_s, g_s) = refs
    else:
        (WU_ref, b_ref, ids_ref, h0_ref, c0_ref,
         hseq_ref, cseq_ref, gseq_ref, h_s, c_s, xh_s, g_s) = refs
    t = pl.program_id(0)
    k = pl.program_id(1)
    cpg = n // wt

    @pl.when((t == 0) & (k == 0))
    def _():
        h_s[:] = h0_ref[:].astype(jnp.float32)
        c_s[:] = c0_ref[:].astype(jnp.float32)

    @pl.when(k == 0)
    def _():
        # build the [onehot | h_{t-1}] row block once per step
        b_sz = h_s.shape[0]
        ids_t = ids_ref[t]                                 # (B,) int32
        cols = jax.lax.broadcasted_iota(jnp.int32, (b_sz, m), 1)
        xh_s[:, :m] = (cols == ids_t[:, None]).astype(cdtype)
        xh_s[:, m:] = h_s[:].astype(cdtype)

    pre = jnp.dot(
        xh_s[:], WU_ref[0], preferred_element_type=jnp.float32,
        precision=_prec(cdtype),
    ) + b_ref[0]
    is_u = k >= 3 * cpg
    act = jnp.where(is_u, jnp.tanh(pre), jax.nn.sigmoid(pre))
    g_s[k] = act
    gseq_ref[0, 0] = act.astype(gseq_ref.dtype)

    @pl.when(k == k_tiles - 1)
    def _():
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
            if drop > 0.0:
                keep = _keep_mask(seed_ref, t, h.shape, 0, _keep_u32(drop),
                                  col_off=kk * wt, n_total=n)
                inv = jnp.asarray(1.0 / (1.0 - drop), jnp.float32)
                hdrop_ref[0, :, sl] = jnp.where(keep, h * inv, 0.0).astype(
                    hdrop_ref.dtype
                )


def pick_tile_width_embed(n: int, m: int, b: int, cdtype_name: str,
                          rdtype_name: str, drop: bool = False) -> int:
    """Tile width for the tiled-embed forward: like ``pick_tile_width`` but
    the streamed tile is the stacked (M+N, wt) weight and an xh scratch
    replaces the xw chunks. The backward is the shared tiled kernel, so its
    budget gates too."""
    cbytes = 2 if cdtype_name == "bfloat16" else 4
    rbytes = 2 if rdtype_name == "bfloat16" else 4
    for wt in (512, 256, 128):
        if n % wt != 0:
            continue
        if pick_tile_width(n, b, cdtype_name, rdtype_name, drop) < wt:
            continue                    # bwd phase budget (shared kernel)
        fwd = (
            2 * (m + n) * wt * cbytes      # stacked WU tile, double-buffered
            + b * (m + n) * cbytes         # xh scratch
            + b * 4 * n * 4                # g_s scratch (f32)
            + 2 * b * n * 4                # h_s, c_s
            + 2 * 2 * b * n * rbytes       # hseq + cseq out blocks
            + 2 * b * wt * rbytes          # gseq out chunks (x2 buf)
            + 2 * b * n * 4                # h0, c0
            + (2 * b * n * rbytes if drop else 0)   # hdrop out blocks (x2)
        )
        if fwd <= VMEM_BUDGET:
            return wt
    return 0


@functools.lru_cache(maxsize=64)
def _make_tiled_embed_seq(s: int, b: int, n: int, m: int, wt: int,
                          variant: str, cdtype_name: str, rdtype_name: str,
                          interpret: bool, vma: tuple = (),
                          drop: float = 0.0):
    """custom-VJP tiled layer-0 sequence op: (WU, b, ids, h0, c0) ->
    (h_seq, (hT, cT)). WU is the stacked (M+N, 4N) weight at the compute
    dtype; backward reuses the shared tiled reverse-time kernel with
    U = WU[M:], and dW/dU/db are per-tile GEMMs over the kernel's tiled dg
    layout (no transpose of the gradient stream). ``drop`` > 0: fused
    output dropout as in ``_make_tiled_seq``."""
    cdtype = jnp.dtype(cdtype_name).type
    rdtype = jnp.dtype(rdtype_name).type
    f32 = jnp.float32
    k_tiles = 4 * n // wt
    base = _make_tiled_seq(s, b, n, wt, variant, cdtype_name, rdtype_name,
                           interpret, vma, drop)
    seed_spec = [pl.BlockSpec(memory_space=pltpu.SMEM)] if drop > 0.0 else []

    def fwd_call(WU, bvec, ids, h0, c0, seed=None):
        WU_t = WU.reshape(m + n, k_tiles, wt).transpose(1, 0, 2)
        b_t = bvec.reshape(k_tiles, 1, wt)
        drop_out_specs, drop_out_shape = [], []
        if drop > 0.0:
            drop_out_specs = [
                pl.BlockSpec((1, b, n), lambda t, k: (t, 0, 0), memory_space=pltpu.VMEM)
            ]
            drop_out_shape = [_sds((s, b, n), rdtype, vma)]
        return pl.pallas_call(
            functools.partial(
                _fwd_tiled_embed_kernel, n, m, k_tiles, wt, variant, cdtype,
                drop,
            ),
            grid=(s, k_tiles),
            in_specs=[
                pl.BlockSpec((1, m + n, wt), lambda t, k: (k, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, wt), lambda t, k: (k, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),     # ids (S, B)
                pl.BlockSpec((b, n), lambda t, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n), lambda t, k: (0, 0), memory_space=pltpu.VMEM),
            ] + seed_spec,
            out_specs=[
                pl.BlockSpec((1, b, n), lambda t, k: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, n), lambda t, k: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, b, wt), lambda t, k: (t, k, 0, 0), memory_space=pltpu.VMEM),
            ] + drop_out_specs,
            out_shape=[
                _sds((s, b, n), rdtype, vma),
                _sds((s, b, n), rdtype, vma),
                _sds((s, k_tiles, b, wt), rdtype, vma),
            ] + drop_out_shape,
            scratch_shapes=[
                pltpu.VMEM((b, n), f32),
                pltpu.VMEM((b, n), f32),
                pltpu.VMEM((b, m + n), cdtype),
                pltpu.VMEM((k_tiles, b, wt), f32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * s * b * (m + n) * 4 * n,
                bytes_accessed=(
                    s * (m + n) * 4 * n * (2 if cdtype_name == "bfloat16" else 4)
                    + s * b * 4 * n * 2 * (2 if rdtype_name == "bfloat16" else 4)
                ),
                transcendentals=2 * s * b * 4 * n,
            ),
            interpret=interpret,
        )(*([WU_t, b_t, ids, h0, c0] + ([seed] if drop > 0.0 else [])))

    def _fwd_core(WU, bvec, ids, h0, c0, seed):
        outs = fwd_call(WU, bvec, ids, h0, c0, seed)
        if drop > 0.0:
            h_seq, c_seq, g_seq, hd_seq = outs
        else:
            h_seq, c_seq, g_seq = outs
            hd_seq = h_seq
        return h_seq, c_seq, g_seq, hd_seq

    def bwd(res, cot):
        WU, h_seq, c_seq, g_seq, ids, h0, c0, seed = res
        dh_seq, (dhT, dcT) = cot
        U = WU[m:]
        xdtype = jnp.bfloat16 if cdtype_name == "bfloat16" else f32
        dg_seq, dc0 = base.bwd_call(
            U, g_seq, c_seq, c0.astype(f32),
            dh_seq.astype(xdtype),
            dhT.astype(f32), dcT.astype(f32), seed,
        )
        # dh0 = dg_0 @ U^T over the tiled layout
        U_t = U.reshape(n, k_tiles, wt).transpose(1, 0, 2).astype(cdtype)
        dh0 = jax.lax.dot_general(
            dg_seq[0].astype(cdtype), U_t,
            dimension_numbers=(((0, 2), (0, 2)), ((), ())),
            preferred_element_type=f32, precision=_prec(cdtype),
        )
        # dWU = [onehot | h_prev]^T dg as per-tile GEMMs over (S, B)
        onehot = jax.nn.one_hot(ids, m, dtype=cdtype)          # (S, B, M)
        h_prev = jnp.concatenate(
            [h0[None].astype(h_seq.dtype), h_seq[:-1]], axis=0
        )
        dg_c = dg_seq.astype(cdtype)
        dW = jax.lax.dot_general(
            onehot, dg_c,
            dimension_numbers=(((0, 1), (0, 2)), ((), ())),
            preferred_element_type=f32, precision=_prec(cdtype),
        ).reshape(m, 4 * n)
        dU = jax.lax.dot_general(
            h_prev.astype(cdtype), dg_c,
            dimension_numbers=(((0, 1), (0, 2)), ((), ())),
            preferred_element_type=f32, precision=_prec(cdtype),
        ).reshape(n, 4 * n)
        dWU = jnp.concatenate([dW, dU], axis=0).astype(WU.dtype)
        db = jnp.sum(dg_seq.astype(f32), axis=(0, 2)).reshape(1, 4 * n)
        return (dWU, db, None, dh0.astype(h0.dtype), dc0.astype(c0.dtype))

    if drop > 0.0:
        @jax.custom_vjp
        def tiled_embed_seq(WU, bvec, ids, h0, c0, seed):
            h_seq, c_seq, _, hd_seq = _fwd_core(WU, bvec, ids, h0, c0, seed)
            return hd_seq, (h_seq[s - 1], c_seq[s - 1])

        def fwd(WU, bvec, ids, h0, c0, seed):
            h_seq, c_seq, g_seq, hd_seq = _fwd_core(WU, bvec, ids, h0, c0, seed)
            out = (hd_seq, (h_seq[s - 1], c_seq[s - 1]))
            return out, (WU, h_seq, c_seq, g_seq, ids, h0, c0, seed)

        def vjp_bwd(res, cot):
            return bwd(res, cot) + (None,)
    else:
        @jax.custom_vjp
        def tiled_embed_seq(WU, bvec, ids, h0, c0):
            h_seq, c_seq, _, _ = _fwd_core(WU, bvec, ids, h0, c0, None)
            return h_seq, (h_seq[s - 1], c_seq[s - 1])

        def fwd(WU, bvec, ids, h0, c0):
            h_seq, c_seq, g_seq, _ = _fwd_core(WU, bvec, ids, h0, c0, None)
            out = (h_seq, (h_seq[s - 1], c_seq[s - 1]))
            return out, (WU, h_seq, c_seq, g_seq, ids, h0, c0, None)

        vjp_bwd = bwd

    tiled_embed_seq.defvjp(fwd, vjp_bwd)
    return tiled_embed_seq


def tiled_embed_supported(cfg: ModelConfig, batch: int) -> bool:
    n, m = cfg.hidden, cfg.vocab
    if n % 128 != 0 or m % 128 != 0 or batch % 8 != 0:
        return False
    rdtype = "float32" if cfg.residual_dtype == "float32" else "bfloat16"
    return pick_tile_width_embed(
        n, m, batch, jnp.dtype(cfg.cdtype).name, rdtype, cfg.dropout > 0.0
    ) > 0


def pallas_tiled_embed_layer0(layer, ids, h0, c0, cfg: ModelConfig, wt=None,
                              dropout=None):
    """Layer-0 recurrence with the embedding fused into the tiled kernel.
    Same contract as ``pallas_cell.pallas_embed_layer0`` (incl. the
    ``dropout=(rate, seed)`` fused-output-dropout option)."""
    s, b = ids.shape
    n, m = cfg.hidden, cfg.vocab
    rdtype_name = "float32" if cfg.residual_dtype == "float32" else "bfloat16"
    drop, seed = dropout if dropout is not None else (0.0, None)
    if wt is None:
        wt = pick_tile_width_embed(
            n, m, b, jnp.dtype(cfg.cdtype).name, rdtype_name, drop > 0.0
        )
    if not wt:
        raise ValueError(f"no embed tile width fits VMEM for N={n}, B={b}")
    fn = _make_tiled_embed_seq(
        s, b, n, m, wt, cfg.cell_variant, jnp.dtype(cfg.cdtype).name,
        rdtype_name, _use_interpret(), _vma_of(layer.W, layer.U, ids, h0, c0),
        float(drop),
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


def pallas_tiled_scan_layer(layer, xw, h0, c0, cfg: ModelConfig, wt=None,
                            dropout=None):
    """Drop-in ``cell_fn`` for ``models.lstm.forward`` — same contract as
    ``pallas_cell.pallas_scan_layer`` but with U streamed in tiles.
    ``dropout``: optional ``(rate, seed)`` — fuses the layer's output
    dropout into the kernel with the SAME mask bits as the resident kernel
    (``_keep_mask`` global element indexing)."""
    s, b, _ = xw.shape
    n = cfg.hidden
    rdtype_name = "float32" if cfg.residual_dtype == "float32" else "bfloat16"
    drop, seed = dropout if dropout is not None else (0.0, None)
    if wt is None:
        wt = pick_tile_width(n, b, jnp.dtype(cfg.cdtype).name, rdtype_name,
                             drop > 0.0)
    if not wt:
        raise ValueError(f"no tile width fits VMEM for N={n}, B={b}")
    fn = _make_tiled_seq(
        s, b, n, wt, cfg.cell_variant, jnp.dtype(cfg.cdtype).name,
        rdtype_name, _use_interpret(), _vma_of(layer.U, xw, h0, c0),
        float(drop),
    )
    xdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    args = (
        layer.U.astype(cfg.cdtype), xw.astype(xdtype),
        h0.astype(jnp.float32), c0.astype(jnp.float32),
    )
    if drop > 0.0:
        h_seq, (hT, cT) = fn(*args, seed)
    else:
        h_seq, (hT, cT) = fn(*args)
    return h_seq, (hT.astype(cfg.pdtype), cT.astype(cfg.pdtype))
