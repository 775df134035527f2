"""Fused per-step cell kernel for tensor-parallel shards.

Why per-step: gate-sharded TP keeps h sharded (B, N/D) and every timestep
needs the FULL h_{t-1} for the shard-local ``h @ U_shard`` — an all-gather
over the model axis *inside* the recurrence. Here ``lax.scan`` owns that
per-step ``all_gather`` and this kernel fuses everything shard-local in the
step — the (B, N) x (N, 4N/D) gate matmul, bias, sigmoid/tanh, and the cell
update — into one Pallas call, removing the per-step HLO materializations
between them. U-shard VMEM residency across steps is unavailable in this
structure (the kernel boundary falls every step); ops/pallas_tp_seq.py is
the sequence-level kernel that restores it by moving the h exchange
*into* the kernel with ICI remote DMAs, and is preferred when its
shape/VMEM gate passes. This per-step kernel remains the fallback (larger
per-shard widths, 2-D meshes) and the simplest TP reference structure.

Backward is a custom VJP with a mirrored fused kernel producing dg and the
carried dc; the dU / dh_full contractions are plain MXU GEMMs outside (the
scan transpose accumulates dU across steps).

On non-TPU platforms (the test suite's virtual CPU mesh) the *same math
functions* run as plain jnp instead of through ``pallas_call`` — interpret-
mode pallas initializes its internal buffers without vma typing, which
vma-checked shard_map rejects; the Mosaic lowering is exercised on real
TPU (like the other kernels, via bench/TPU drives). Gate layout is the
TP-permuted shard-local [i|o|f|u], each N/D wide (parallel/tp.py);
exactness vs the XLA TP scan is gated by tests/test_tp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from .pallas_cell import _cell_fwd, _gate_bwd, _prec, _use_interpret


def _fwd_math(U, xw, h_full, c_d, nd, variant, cdtype):
    """The fused step: gate matmul + bias(in xw) + activations + cell.
    Shared verbatim by the Pallas kernel body and the CPU fallback."""
    g_pre = xw.astype(jnp.float32) + jnp.dot(
        h_full.astype(cdtype), U.astype(cdtype),
        preferred_element_type=jnp.float32, precision=_prec(cdtype),
    )
    iof = jax.nn.sigmoid(g_pre[:, : 3 * nd])
    u = jnp.tanh(g_pre[:, 3 * nd :])
    h2, c2 = _cell_fwd(
        iof[:, :nd], iof[:, nd : 2 * nd], iof[:, 2 * nd : 3 * nd], u,
        c_d.astype(jnp.float32), variant,
    )
    return h2, c2, jnp.concatenate([iof, u], axis=-1)


def _bwd_math(g, c2, c_prev, dh, dc, nd, variant):
    """Gate backward producing dg and the carried dc (shared with kernel)."""
    g = g.astype(jnp.float32)
    i = g[:, :nd]
    o = g[:, nd : 2 * nd]
    f = g[:, 2 * nd : 3 * nd]
    u = g[:, 3 * nd :]
    dgs, dc_next = _gate_bwd(
        i, o, f, u, c2.astype(jnp.float32), c_prev.astype(jnp.float32),
        dh.astype(jnp.float32), dc.astype(jnp.float32), variant,
    )
    return jnp.concatenate(dgs, axis=-1), dc_next


def _step_fwd_kernel(nd, variant, cdtype, U_ref, xw_ref, h_ref, c_ref,
                     h2_ref, c2_ref, g_ref):
    h2, c2, g = _fwd_math(
        U_ref[:], xw_ref[:], h_ref[:], c_ref[:], nd, variant, cdtype
    )
    h2_ref[:] = h2
    c2_ref[:] = c2
    g_ref[:] = g.astype(g_ref.dtype)


def _step_bwd_kernel(nd, variant, g_ref, c2_ref, cprev_ref, dh_ref, dc_ref,
                     dg_ref, dcp_ref):
    dg, dcp = _bwd_math(
        g_ref[:], c2_ref[:], cprev_ref[:], dh_ref[:], dc_ref[:], nd, variant
    )
    dg_ref[:] = dg.astype(dg_ref.dtype)
    dcp_ref[:] = dcp


@functools.lru_cache(maxsize=64)
def _make_tp_step(b: int, n: int, nd: int, variant: str, cdtype_name: str,
                  fallback: bool, axis: str = None):
    cdtype = jnp.dtype(cdtype_name).type
    f32 = jnp.float32
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    # under vma-checked shard_map the real (Mosaic) lowering requires the
    # outputs' varying axes stated explicitly on the out_shapes
    vma = frozenset({axis}) if axis else frozenset()

    def sds(*shape):
        return jax.ShapeDtypeStruct(shape, f32, vma=vma)

    if fallback:
        def fwd_call(U, xw, h_full, c_d):
            return _fwd_math(U, xw, h_full, c_d, nd, variant, cdtype)

        def bwd_call(g, c2, c_prev, dh, dc):
            return _bwd_math(g, c2, c_prev, dh, dc, nd, variant)
    else:
        def fwd_call(U, xw, h_full, c_d):
            return pl.pallas_call(
                functools.partial(_step_fwd_kernel, nd, variant, cdtype),
                in_specs=[vspec] * 4,
                out_specs=[vspec] * 3,
                out_shape=[sds(b, nd), sds(b, nd), sds(b, 4 * nd)],
            )(U, xw, h_full, c_d)

        def bwd_call(g, c2, c_prev, dh, dc):
            return pl.pallas_call(
                functools.partial(_step_bwd_kernel, nd, variant),
                in_specs=[vspec] * 5,
                out_specs=[vspec] * 2,
                out_shape=[sds(b, 4 * nd), sds(b, nd)],
            )(g, c2, c_prev, dh, dc)

    @jax.custom_vjp
    def tp_step(U, xw, h_full, c_d):
        h2, c2, _ = fwd_call(U, xw, h_full, c_d)
        return h2, c2

    def tp_step_fwd(U, xw, h_full, c_d):
        h2, c2, g = fwd_call(U, xw, h_full, c_d)
        return (h2, c2), (U, g, c2, c_d, h_full)

    def tp_step_bwd(res, cot):
        U, g, c2, c_prev, h_full = res
        dh2, dc2 = cot
        dg, dcp = bwd_call(
            g, c2, c_prev.astype(f32), dh2.astype(f32), dc2.astype(f32)
        )
        dh_full = jax.lax.dot_general(
            dg.astype(cdtype), U.astype(cdtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=_prec(cdtype),
        )
        dU = jax.lax.dot_general(
            h_full.astype(cdtype), dg.astype(cdtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_prec(cdtype),
        )
        return (dU.astype(U.dtype), dg, dh_full.astype(h_full.dtype), dcp)

    tp_step.defvjp(tp_step_fwd, tp_step_bwd)
    return tp_step


def fused_tp_step(U, xw, h_full, c_d, cfg: ModelConfig, axis: str = None):
    """One TP cell step: (U (N, 4N/D), xw (B, 4N/D), h_full (B, N),
    c_d (B, N/D)) -> (h_d, c_d) in fp32. ``axis``: model mesh axis name,
    needed for vma typing when lowering for real (non-fallback)."""
    b, n = h_full.shape
    nd = c_d.shape[-1]
    fn = _make_tp_step(
        b, n, nd, cfg.cell_variant, jnp.dtype(cfg.cdtype).name,
        _use_interpret(), axis,
    )
    return fn(U, xw, h_full.astype(cfg.cdtype), c_d.astype(jnp.float32))


def tp_pallas_supported(cfg: ModelConfig, batch: int, ndev: int) -> bool:
    nd = cfg.hidden // ndev
    return (
        cfg.hidden % ndev == 0
        and nd % 128 == 0
        and batch % 8 == 0
        and cfg.vocab % 128 == 0
    )
