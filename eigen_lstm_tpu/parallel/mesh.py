"""Device-mesh helpers.

The reference is strictly single-device (``cudaSetDevice(4)``,
``class_CUDA/lstm.cc:51``; SURVEY.md §2.4 — no NCCL/MPI/multi-process
anything). Multi-chip scaling in the rebuild is JAX-native: a 1-D
``jax.sharding.Mesh`` over the ICI domain with the batch dimension sharded
(data parallelism); collectives are XLA ``psum`` over the mesh axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axis: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data-parallel mesh over local devices (ICI within a pod slice)."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devs)}"
            )
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data", batch_dim: int = 0) -> NamedSharding:
    """Sharding that splits ``batch_dim`` across the mesh axis."""
    spec = [None] * (batch_dim + 1)
    spec[batch_dim] = axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
