"""Recurrence-backend dispatch: fused Pallas kernel vs XLA scan.

Mirrors the reference's Eigen-vs-CUDA backend switch (``__GPU__`` in
``class_CUDA/lstm.cc``), except selection is a runtime choice validated by
parity tests instead of a compile-time #ifdef.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax

from ..config import ModelConfig


def _shape_ok(mcfg: ModelConfig, batch: int) -> bool:
    # gate slices along the lane axis must be 128-aligned; batch maps to
    # sublanes (8 for fp32)
    return mcfg.hidden % 128 == 0 and batch % 8 == 0


def resident_supported(mcfg: ModelConfig, batch: int) -> bool:
    """The resident-U fused kernel holds U (N, 4N) plus per-step blocks in
    VMEM (~16 MB/core): supported up to N≈1024 fp32 / N≈1024 bf16, with a
    batch-dependent bound from the backward's double-buffered (B, 4N)
    g/dg blocks (calibrated against Mosaic's scoped-vmem accounting:
    22.0 MB at N=1024 B=256 bf16, 21.45 MB at N=256 B=1024 fp32 — both
    reject; N=1024 B=128 bf16 at ~15.2 MB runs)."""
    if not _shape_ok(mcfg, batch):
        return False
    csz = 2 if mcfg.compute_dtype == "bfloat16" else 4
    rsz = 2 if mcfg.residual_dtype == "bfloat16" else 4
    xsz = csz   # dg/xw stream dtype follows the compute dtype
    vmem_u = mcfg.hidden * 4 * mcfg.hidden * csz
    if vmem_u > 8 * 1024 * 1024:
        return False
    # backward working set: the double-buffered (B, 4N) g-in (rsz) and
    # dg-out (xsz) blocks dominate the batch-scaled cost
    bwd = vmem_u + batch * mcfg.hidden * 8 * (rsz + xsz)
    return bwd <= 16 * 1024 * 1024


def tiled_supported(mcfg: ModelConfig, batch: int) -> bool:
    """The tiled-U kernel streams U in double-buffered tiles — the N >= 2048
    bf16 regime where the step is HBM-bound on U (pallas_cell_tiled.py)."""
    if not _shape_ok(mcfg, batch):
        return False
    from .pallas_cell_tiled import pick_tile_width

    rdtype = "float32" if mcfg.residual_dtype == "float32" else "bfloat16"
    return pick_tile_width(
        mcfg.hidden, batch, mcfg.compute_dtype, rdtype, mcfg.dropout > 0.0
    ) > 0


def pallas_supported(
    mcfg: ModelConfig, batch: int, interpret: bool = False
) -> bool:
    """Some Pallas recurrence path (resident or tiled) applies.
    ``interpret=True`` skips the platform gate: the kernels run under the
    Pallas TPU interpreter on CPU (how the test suite and the driver's
    ``dryrun_multichip`` exercise them without a chip)."""
    try:
        from . import pallas_cell  # noqa: F401
    except ImportError:
        return False
    if not interpret and jax.devices()[0].platform != "tpu":
        return False
    return resident_supported(mcfg, batch) or tiled_supported(mcfg, batch)


def select_cell_fn(
    backend: str, mcfg: ModelConfig, batch: int, interpret: bool = False
) -> Optional[object]:
    """Returns a ``cell_fn`` for ``models.lstm.forward`` or None (XLA scan)."""
    if backend == "xla":
        return None
    if backend in ("auto", "pallas"):
        ok = pallas_supported(mcfg, batch, interpret)
        if not ok:
            if backend == "pallas":
                raise ValueError(
                    f"pallas backend unsupported for hidden={mcfg.hidden} on "
                    f"platform {jax.devices()[0].platform}"
                )
            return None
        from . import pallas_cell as pc

        resident = resident_supported(mcfg, batch)
        if resident:
            cell_fn = pc.pallas_scan_layer
        else:
            from .pallas_cell_tiled import pallas_tiled_scan_layer

            cell_fn = pallas_tiled_scan_layer
        cell_fn = functools.partial(cell_fn)
        # both kernel families fuse inter-layer dropout in-kernel with
        # identical mask bits (models.lstm.forward gates on this;
        # pallas_cell.py _keep_mask — global element indexing)
        cell_fn.fused_dropout = True
        if pc.embed_supported(mcfg, batch):
            # expose the fused-embedding layer-0 kernel to models.forward
            cell_fn.embed_layer0 = pc.pallas_embed_layer0
        elif not resident:
            from .pallas_cell_tiled import (
                pallas_tiled_embed_layer0,
                tiled_embed_supported,
            )

            if tiled_embed_supported(mcfg, batch):
                # fused embedding for the tiled (U > VMEM) regime: kills the
                # (S·B, 4N) xw stream where the step is HBM-bound already
                cell_fn.embed_layer0 = pallas_tiled_embed_layer0
        from . import pallas_head

        # fused softmax-CE head (gated per-shape at trace time in loss_fn)
        head = functools.partial(pallas_head.fused_head_bits)
        head.supported = pallas_head.head_supported
        cell_fn.fused_head = head
        return cell_fn
    raise ValueError(f"unknown backend {backend!r}")
