"""Sequence-level tensor-parallel LSTM kernel with in-kernel ICI collectives.

The per-step TP kernel (ops/pallas_tp_cell.py) must re-load its U shard from
HBM every timestep because the recurrence's per-step ``all_gather`` of h
lives between pallas_calls in the ``lax.scan``. This kernel removes that
boundary: ONE pallas_call runs the whole S-step recurrence with the U shard
(N, 4N/D) pinned in VMEM across the time grid — the design
docs/PERFORMANCE.md round 2 named but could not previously validate — and
the h exchange happens *inside* the kernel over ICI with remote DMAs
(``pltpu.make_async_remote_copy``) and DMA semaphores.

Forward, per grid step t (device d of D, model axis):
    g_d  = xw_d[t] + h_full @ U_d          # MXU; U_d VMEM-resident for all S
    h_d, c_d = cell(g_d, c_d)              # local epilogue (shard-local
                                           #   [i|o|f|u] gates, parallel/tp.py)
    all-to-all: h_d -> slot d of every peer's slot-((t+1) mod 3) h buffer
The end-of-step waits on all D-1 incoming chunks bound any device's lead
over any other to ONE step; triple-buffering the exchange target by
t mod 3 then keeps a one-step-ahead sender's writes off the buffer its
laggard peer is still reading (double buffering does NOT: the ahead
sender's (t+2) mod 2 target aliases the laggard's in-flight t mod 2 read —
a real data race caught by the interpret-mode race detector during
development).
(The equivalent NVIDIA-world structure would be NCCL calls between CUDA
kernel launches; the reference itself is single-device — SURVEY.md §2.4.)

Backward (reverse time grid) mirrors it with a reduce-scatter: each device
computes its full (B, N) partial ``dg_d @ U_d^T``, ships chunk j to device j
(which owns dh slice j), and each device sums its D received chunks into the
dh carry — only the (B, N/D) slice any device actually needs. dU/dW stay
OUTSIDE the kernel as two big MXU GEMMs over the saved residual streams
(same split as the scan transpose of the XLA path).

Validation: jax 0.9's TPU interpret mode simulates remote DMAs + semaphores
across the virtual CPU mesh (with optional race detection), so exactness vs
the XLA TP scan — loss, all gradients, carried state — is gated by
tests/test_tp_seq.py on 2-8 devices, something previously believed to
require multi-chip hardware. On the real (single-chip) box the Mosaic
lowering is exercised with D=1 (collectives degenerate, VMEM residency and
grid semantics identical).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from .pallas_cell import _prec, _use_interpret
from .pallas_tp_cell import _bwd_math, _fwd_math

VMEM_BUDGET = 14 * 1024 * 1024


def _fwd_kernel(nd, ndev, seq, variant, cdtype, pdtype, axis,
                U_ref, xw_ref, h0_ref, c0_ref,
                hseq_ref, gseq_ref, cprev_ref, hT_ref, cT_ref,
                hbuf, cbuf, send_sems, recv_sems):
    t = pl.program_id(0)
    me = jax.lax.axis_index(axis) if ndev > 1 else 0

    @pl.when(t == 0)
    def _():
        hbuf[0] = h0_ref[...].astype(hbuf.dtype)
        cbuf[...] = c0_ref[...].astype(jnp.float32)

    # TRIPLE-buffered h exchange: the per-step waits bound any device's lead
    # over any other to one step, and a one-step-ahead sender writes slot
    # (t+2)%3 while the laggard still reads t%3 — distinct. (Double buffering
    # is NOT enough: the ahead sender's (t+2)%2 == t%2 collides with the
    # laggard's in-flight read; caught by the interpret-mode race detector.)
    p = jax.lax.rem(t, 3)
    q = jax.lax.rem(t + 1, 3)
    cprev_ref[0] = cbuf[...].astype(cprev_ref.dtype)
    h2, c2, g = _fwd_math(
        U_ref[...], xw_ref[0], hbuf[p], cbuf[...], nd, variant, cdtype
    )
    # the XLA TP scan rounds the carried h/c to param dtype every step
    # (parallel/tp.py step()); match it so parity holds for every
    # pdtype/cdtype combination, not just pdtype == float32
    h2r = h2.astype(pdtype)
    c2r = c2.astype(pdtype)
    gseq_ref[0] = g.astype(gseq_ref.dtype)
    hseq_ref[0] = h2r.astype(hseq_ref.dtype)
    cbuf[...] = c2r.astype(jnp.float32)

    @pl.when(t == seq - 1)
    def _():
        hT_ref[...] = h2r.astype(jnp.float32)
        cT_ref[...] = c2r.astype(jnp.float32)

    if ndev > 1:
        # own slot locally, then one remote DMA per peer into their slot `me`
        # of the slot-q buffer (the SPMD scratch layout makes the sender's
        # address arithmetic land in the right place on the receiver). The
        # last step's gather feeds nothing — skip it so no DMA is in flight
        # when kernels exit.
        @pl.when(t < seq - 1)
        def _():
            hbuf[q, :, pl.ds(me * nd, nd)] = h2r.astype(hbuf.dtype)
            copies = []
            for k in range(1, ndev):
                peer = jax.lax.rem(me + k, ndev)
                copies.append(pltpu.make_async_remote_copy(
                    src_ref=hbuf.at[q, :, pl.ds(me * nd, nd)],
                    dst_ref=hbuf.at[q, :, pl.ds(me * nd, nd)],
                    send_sem=send_sems.at[k - 1],
                    recv_sem=recv_sems.at[k - 1],
                    # named-axis (MESH) addressing — see the bwd kernel note
                    device_id={axis: peer},
                    device_id_type=pltpu.DeviceIdType.MESH,
                ))
            for c in copies:
                c.start()
            for c in copies:
                c.wait()
    else:
        hbuf[q] = h2r.astype(hbuf.dtype)


def _bwd_kernel(nd, ndev, seq, variant, cdtype, axis,
                U_ref, gseq_ref, cprev_ref, c2_ref, cT_ref,
                dhseq_ref, dhT_ref, dcT_ref,
                dgseq_ref, dh0_ref, dc0_ref,
                dcbuf, pbuf, rbuf, send_sems, recv_sems):
    i = pl.program_id(0)            # reverse grid; time t = seq - 1 - i
    me = jax.lax.axis_index(axis) if ndev > 1 else 0
    first = i == 0
    f32 = jnp.float32

    c_prev = cprev_ref[0].astype(f32)
    c2 = jnp.where(first, cT_ref[...].astype(f32), c2_ref[0].astype(f32))
    # dh carry: the reduce-scattered sum of the later step's dg @ U^T partials
    # (slot (i-1)%3 — written and waited at step i-1; triple-buffered for the
    # same one-step-lead reason as the forward), or dhT at the cut
    rs_prev = jnp.sum(rbuf[jax.lax.rem(i + 2, 3)], axis=0)
    dh = dhseq_ref[0].astype(f32) + jnp.where(
        first, dhT_ref[...].astype(f32), rs_prev
    )
    dc = jnp.where(first, dcT_ref[...].astype(f32), dcbuf[...])

    dg, dc_prev = _bwd_math(gseq_ref[0], c2, c_prev, dh, dc, nd, variant)
    dgseq_ref[0] = dg.astype(dgseq_ref.dtype)
    dcbuf[...] = dc_prev

    # full dh_prev partial for every shard owner: (B, N) = dg_d @ U_d^T
    partial = jax.lax.dot_general(
        dg.astype(cdtype), U_ref[...].astype(cdtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32, precision=_prec(cdtype),
    )
    w = jax.lax.rem(i, 3)
    if ndev > 1:
        pbuf[...] = partial
        rbuf[w, me] = pbuf[:, pl.ds(me * nd, nd)]
        copies = []
        for k in range(1, ndev):
            peer = jax.lax.rem(me + k, ndev)
            copies.append(pltpu.make_async_remote_copy(
                src_ref=pbuf.at[:, pl.ds(peer * nd, nd)],
                dst_ref=rbuf.at[w, me],
                send_sem=send_sems.at[k - 1],
                recv_sem=recv_sems.at[k - 1],
                # named-axis (MESH) addressing: peer on the model axis, same
                # coordinates on any other mesh axes — correct on 2-D
                # (data x model) meshes, not just a 1-D TP mesh
                device_id={axis: peer},
                device_id_type=pltpu.DeviceIdType.MESH,
            ))
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
    else:
        rbuf[w, 0] = partial

    @pl.when(i == seq - 1)
    def _():
        # t == 0: the reduce-scattered slice is the h0 cotangent
        dh0_ref[...] = jnp.sum(rbuf[w], axis=0)
        dc0_ref[...] = dc_prev


@functools.lru_cache(maxsize=32)
def _make_tp_seq(b: int, n: int, nd: int, seq: int, ndev: int, variant: str,
                 cdtype_name: str, rdtype_name: str, pdtype_name: str,
                 axis: str, interpret_kind: str, vma_key: tuple = ()):
    cdtype = jnp.dtype(cdtype_name).type
    rdtype = jnp.dtype(rdtype_name)
    pdtype = jnp.dtype(pdtype_name)
    f32 = jnp.float32
    # out_shape vma annotation: the union of the inputs' varying axes at the
    # call site (derived by tp_seq_lstm via jax.typeof) — {"model"} on a 1-D
    # TP mesh, {"data", "model"} on the 2-D mesh, empty under
    # check_vma=False (the interpret-mode test harness)
    vma = frozenset(vma_key)
    if interpret_kind == "none":
        interpret = False
    else:
        # 'eager' DMA execution: the default 'on_wait' mode flakily reorders
        # remote-DMA payload movement relative to the semaphore waits at
        # ndev >= 4 (stale/NaN chunks with the race detector silent) —
        # an artifact of the interpreter's deferred-execution machinery, not
        # of the exchange protocol; eager mode moves payloads at issue order
        # and is deterministic across hundreds of runs (tests/test_tp_seq.py)
        interpret = pltpu.InterpretParams(
            detect_races=(interpret_kind == "races"),
            dma_execution_mode="eager",
        )

    def sds(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)

    nsem = max(ndev - 1, 1)
    cmn = dict(grid=(seq,), interpret=interpret)
    const2 = lambda s: pl.BlockSpec(s, lambda t: (0, 0))
    perstep = lambda s: pl.BlockSpec((1,) + s, lambda t: (t, 0, 0))
    revstep = lambda s: pl.BlockSpec((1,) + s, lambda i: (seq - 1 - i, 0, 0))

    fwd_call = pl.pallas_call(
        functools.partial(
            _fwd_kernel, nd, ndev, seq, variant, cdtype, pdtype, axis
        ),
        in_specs=[
            const2((n, 4 * nd)),                       # U shard
            perstep((b, 4 * nd)),                      # xw (+bias), adtype
            const2((b, n)),                            # h0_full
            const2((b, nd)),                           # c0 shard
        ],
        out_specs=[
            perstep((b, nd)),                          # h_seq_d
            perstep((b, 4 * nd)),                      # g residuals
            perstep((b, nd)),                          # c_prev residuals
            const2((b, nd)),                           # hT
            const2((b, nd)),                           # cT
        ],
        out_shape=[
            sds((seq, b, nd), pdtype),
            sds((seq, b, 4 * nd), rdtype),
            sds((seq, b, nd), rdtype),
            sds((b, nd), f32),
            sds((b, nd), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, b, n), jnp.dtype(cdtype_name)),
            pltpu.VMEM((b, nd), f32),
            pltpu.SemaphoreType.DMA((nsem,)),
            pltpu.SemaphoreType.DMA((nsem,)),
        ],
        **cmn,
    )

    c2_map = lambda i: (jnp.minimum(seq - i, seq - 1), 0, 0)
    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, nd, ndev, seq, variant, cdtype, axis),
        in_specs=[
            const2((n, 4 * nd)),                       # U shard
            revstep((b, 4 * nd)),                      # g residuals
            revstep((b, nd)),                          # c_prev at t
            pl.BlockSpec((1, b, nd), c2_map),          # c2 at t (= c_prev[t+1])
            const2((b, nd)),                           # cT (c2 at t = S-1)
            revstep((b, nd)),                          # dh cotangents
            const2((b, nd)),                           # dhT
            const2((b, nd)),                           # dcT
        ],
        out_specs=[
            revstep((b, 4 * nd)),                      # dg (= dxw)
            const2((b, nd)),                           # dh0 shard
            const2((b, nd)),                           # dc0 shard
        ],
        out_shape=[
            sds((seq, b, 4 * nd), f32),
            sds((b, nd), f32),
            sds((b, nd), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, nd), f32),                  # dc carry
            pltpu.VMEM((b, n), f32),                   # dh partial staging
            pltpu.VMEM((3, ndev, b, nd), f32),         # reduce-scatter chunks
            pltpu.SemaphoreType.DMA((nsem,)),
            pltpu.SemaphoreType.DMA((nsem,)),
        ],
        **cmn,
    )

    def _gather_h0(h0_d):
        if ndev > 1:
            return jax.lax.all_gather(h0_d, axis, axis=1, tiled=True)
        return h0_d

    @jax.custom_vjp
    def tp_seq(U, xw, h0_d, c0_d):
        h_seq_d, _, _, hT, cT = fwd_call(U, xw, _gather_h0(h0_d), c0_d)
        return h_seq_d, hT, cT

    def tp_seq_fwd(U, xw, h0_d, c0_d):
        h0_full = _gather_h0(h0_d)
        h_seq_d, gseq, cprevseq, hT, cT = fwd_call(U, xw, h0_full, c0_d)
        return (h_seq_d, hT, cT), (U, gseq, cprevseq, cT, h0_full, h_seq_d)

    def tp_seq_bwd(res, cot):
        U, gseq, cprevseq, cT, h0_full, h_seq_d = res
        dhseq, dhT, dcT = cot
        dgseq, dh0, dc0 = bwd_call(
            U, gseq, cprevseq, cprevseq, cT,
            dhseq.astype(f32), dhT.astype(f32), dcT.astype(f32),
        )
        # dU = sum_t h_prev_full_t^T dg_t — one big MXU GEMM outside the
        # kernel (the scan-transpose split of the XLA path); h_prev_full is
        # rebuilt from the primal output instead of a (S, B, N) residual
        if ndev > 1:
            hfull_seq = jax.lax.all_gather(h_seq_d, axis, axis=2, tiled=True)
        else:
            hfull_seq = h_seq_d
        hprev = jnp.concatenate(
            [h0_full[None].astype(hfull_seq.dtype), hfull_seq[:-1]], axis=0
        )
        dU = jax.lax.dot_general(
            hprev.reshape(seq * b, n).astype(cdtype),
            dgseq.reshape(seq * b, 4 * nd).astype(cdtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_prec(cdtype),
        )
        # a custom_vjp must hand back cotangents with the primal's vma: on a
        # 2-D (data x model) mesh the activations vary over "data" but U
        # does not, so dU picks up the extra axis — reduce over it, exactly
        # the psum the XLA path's automatic transpose inserts for a
        # data-invariant operand of a data-varying contraction
        u_vma = getattr(jax.typeof(U), "vma", frozenset()) or frozenset()
        du_vma = getattr(jax.typeof(dU), "vma", frozenset()) or frozenset()
        extra = tuple(sorted(du_vma - u_vma))
        if extra:
            dU = jax.lax.psum(dU, extra)
        return (dU.astype(U.dtype), dgseq, dh0, dc0)

    tp_seq.defvjp(tp_seq_fwd, tp_seq_bwd)
    return tp_seq


def tp_seq_lstm(U, xw, h0_d, c0_d, cfg: ModelConfig, axis: str,
                ndev: int, interpret_kind: str = None):
    """Whole-sequence TP recurrence: (U (N, 4N/D), xw (S, B, 4N/D) with bias,
    h0_d/c0_d (B, N/D)) -> (h_seq_d (S, B, N/D), (hT, cT)). Drop-in for
    ``parallel.tp._tp_scan_layer``'s contract."""
    s, b, _ = xw.shape
    n = U.shape[0]
    nd = c0_d.shape[-1]
    if interpret_kind is None:
        interpret_kind = "interpret" if _use_interpret() else "none"
    vma = frozenset()
    for v in (U, xw, h0_d, c0_d):
        vma |= getattr(jax.typeof(v), "vma", frozenset()) or frozenset()
    fn = _make_tp_seq(
        b, n, nd, s, ndev, cfg.cell_variant,
        jnp.dtype(cfg.cdtype).name, jnp.dtype(cfg.residual_dtype).name,
        jnp.dtype(cfg.pdtype).name, axis, interpret_kind,
        tuple(sorted(vma)),
    )
    # U enters the kernel pre-cast to compute dtype: the VMEM block is then
    # csz-sized (what tp_seq_supported budgets) and the per-step
    # U_ref.astype inside the kernel is a no-op; the astype's transpose
    # returns dU to the param dtype automatically
    h_seq_d, hT, cT = fn(U.astype(cfg.cdtype), xw.astype(jnp.float32),
                         h0_d.astype(jnp.float32), c0_d.astype(jnp.float32))
    return h_seq_d, (hT.astype(cfg.pdtype), cT.astype(cfg.pdtype))


def tp_seq_supported(cfg: ModelConfig, batch: int, ndev: int) -> bool:
    """Shape/VMEM gate: shard slices lane-aligned, U shard + h buffers +
    per-step blocks within budget for both kernels."""
    if cfg.hidden % ndev != 0:
        return False
    nd = cfg.hidden // ndev
    if nd % 128 != 0 or batch % 8 != 0:
        return False
    n, b = cfg.hidden, batch
    csz = jnp.dtype(cfg.cdtype).itemsize
    rsz = jnp.dtype(cfg.residual_dtype).itemsize
    fwd = (
        n * 4 * nd * csz            # U
        + 3 * b * n * csz           # h exchange buffers (triple-buffered)
        + 2 * b * 4 * nd * 4        # xw blocks (double-buffered)
        + b * 4 * nd * rsz          # g out block
        + 4 * b * nd * 4            # h/c/cprev/hT-cT blocks
    )
    bwd = (
        n * 4 * nd * csz
        + b * n * 4                 # partial staging
        + 3 * ndev * b * nd * 4     # reduce-scatter chunks
        + 2 * b * 4 * nd * (rsz + 4)  # g in + dg out blocks
        + 6 * b * nd * 4
    )
    return max(fwd, bwd) <= VMEM_BUDGET
