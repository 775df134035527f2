"""Fused Adagrad update as a Pallas TPU kernel.

Reference: the fused CUDA kernel ``kernel_cuda_elementwise_adagrad`` computes
``m += d*d; p -= lr * d * rsqrt(m + 1e-10)`` in one pass
(``class_CUDA/cu_kernels.cu:193-209``, launched via ``cu_matrix.cu:365-375``).

MEASURED AND RETIRED from the production path (round 2): XLA already fuses
the pytree update into one elementwise pass (the in-superstep profile shows
the whole Adagrad update as a single ~62 us fusion at the headline config),
while this kernel costs one pallas_call per tensor — measured standalone on
the v5e it is ~1.4x slower than the jitted jnp update (1304 vs 929 us
including dispatch). It is kept as the reference-parity artifact for the
fused CUDA kernel (validated against the jnp optimizer in
tests/test_pallas_adagrad.py), mirroring how the reference cross-checks its
fused Adagrad against the Eigen path — not as an optimization.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PyTree = Any


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _adagrad_kernel(eps, p_ref, g_ref, m_ref, lr_ref, p_out, m_out):
    g = g_ref[:].astype(jnp.float32)
    m_new = m_ref[:].astype(jnp.float32) + g * g
    lr = lr_ref[0]
    p_out[:] = (
        p_ref[:].astype(jnp.float32) - lr * g * jax.lax.rsqrt(m_new + eps)
    ).astype(p_out.dtype)
    m_out[:] = m_new.astype(m_out.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows"))
def _adagrad_2d(p, g, m, lr, eps: float = 1e-10, block_rows: int = 256):
    rows, cols = p.shape
    br = min(block_rows, rows)
    grid = (pl.cdiv(rows, br),)
    spec = pl.BlockSpec((br, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1)
    return pl.pallas_call(
        functools.partial(_adagrad_kernel, eps),
        grid=grid,
        in_specs=[
            spec,
            spec,
            spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct(m.shape, m.dtype),
        ],
        input_output_aliases={0: 0, 2: 1},   # p->p_out, m->m_out in place
        interpret=_use_interpret(),
    )(p, g, m, lr_arr)


def adagrad_update_fused(
    params: PyTree, grads: PyTree, m: PyTree, lr, eps: float = 1e-10
) -> Tuple[PyTree, PyTree]:
    """Pytree Adagrad step using the fused kernel for 2-D tensors (lane-
    aligned) and the jnp path elsewhere. Same contract as
    ``train.optimizer.adagrad_update`` and validated against it."""

    def upd(p, g, mm):
        if p.ndim == 2 and p.shape[1] % 128 == 0 and p.shape[0] % 8 == 0:
            return _adagrad_2d(p, g, mm, lr, eps=eps)
        g32 = g.astype(jnp.float32)
        m_new = mm.astype(jnp.float32) + g32 * g32
        p_new = p.astype(jnp.float32) - jnp.asarray(lr, jnp.float32) * g32 * jax.lax.rsqrt(m_new + eps)
        return p_new.astype(p.dtype), m_new.astype(mm.dtype)

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_m = jax.tree_util.tree_leaves(m)
    outs = [upd(p, g, mm) for p, g, mm in zip(flat_p, flat_g, flat_m)]
    new_p = jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs])
    new_m = jax.tree_util.tree_unflatten(treedef, [o[1] for o in outs])
    return new_p, new_m
