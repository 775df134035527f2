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


def pallas_supported(mcfg: ModelConfig, batch: int) -> bool:
    """The fused kernel holds U (N, 4N) plus per-step blocks in VMEM
    (~16 MB/core): supported up to N≈1024 fp32. Larger models fall back to
    the XLA scan until the tiled-U kernel lands."""
    try:
        from . import pallas_cell  # noqa: F401
    except ImportError:
        return False
    if jax.devices()[0].platform != "tpu":
        return False
    n = mcfg.hidden
    if n % 128 != 0 or batch % 8 != 0:
        # gate slices along the lane axis must be 128-aligned; batch maps to
        # sublanes (8 for fp32)
        return False
    bytes_per = 2 if mcfg.compute_dtype == "bfloat16" else 4
    vmem_u = n * 4 * n * bytes_per  # U is held in VMEM at the compute dtype
    return vmem_u <= 8 * 1024 * 1024


def select_cell_fn(backend: str, mcfg: ModelConfig, batch: int) -> Optional[object]:
    """Returns a ``cell_fn`` for ``models.lstm.forward`` or None (XLA scan)."""
    if backend == "xla":
        return None
    if backend in ("auto", "pallas"):
        ok = pallas_supported(mcfg, batch)
        if not ok:
            if backend == "pallas":
                raise ValueError(
                    f"pallas backend unsupported for hidden={mcfg.hidden} on "
                    f"platform {jax.devices()[0].platform}"
                )
            return None
        from . import pallas_cell as pc

        cell_fn = pc.pallas_scan_layer
        if pc.embed_supported(mcfg, batch):
            # expose the fused-embedding layer-0 kernel to models.forward
            cell_fn = functools.partial(pc.pallas_scan_layer)
            cell_fn.embed_layer0 = pc.pallas_embed_layer0
        return cell_fn
    raise ValueError(f"unknown backend {backend!r}")
