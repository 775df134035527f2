"""Adagrad — the reference's only optimizer — plus rebuild extensions.

Reference: ``m += g*g; p -= lr * g / sqrt(m + eps)`` applied tensor-wise to
{W, U, b, Why, by} (root ``lstm.cc:261-272``; fused CUDA kernel
``class_CUDA/cu_kernels.cu:193-209`` computes ``p -= lr*d*rsqrt(m+1e-10)``).

Rebuild extensions mandated by BASELINE.json: optional global-norm gradient
clipping (the reference has none — SURVEY.md §2.2) and the LR warm-up the
final driver implements as "lr = 0 for the first 50*S iterations"
(``class_CUDA/lstm.cc:364-367``).

The update is a pytree map that XLA fuses into one elementwise pass per
tensor; a hand-fused Pallas variant lives in ``ops/pallas_adagrad.py`` and is
validated against this one (mirroring how the reference cross-checks its
fused CUDA Adagrad against the Eigen path).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from ..config import TrainConfig

PyTree = Any


def adagrad_init(params: PyTree) -> PyTree:
    """Zero-initialized squared-gradient accumulators, one per tensor
    (root ``lstm.cc:107-111``)."""
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def global_norm(grads: PyTree, psum_axis=None, replicated: PyTree = None) -> jax.Array:
    """L2 norm over the whole pytree; with ``psum_axis`` the squared sums are
    additionally summed over that mesh axis (parameter-sharded training —
    e.g. tensor parallelism — where each device holds distinct shards).

    ``replicated``: optional bool pytree (same structure) marking leaves that
    are *replicated* across ``psum_axis`` — every shard holds the identical
    grad, so their squared sum is pre-divided by the axis size to keep the
    psum'd norm equal to the canonical single-device norm."""
    leaves = jax.tree_util.tree_leaves(grads)
    if psum_axis is not None and replicated is not None:
        rep = jax.tree_util.tree_leaves(replicated)
        size = jax.lax.psum(1, psum_axis)
        sq = sum(
            jnp.sum(jnp.square(g.astype(jnp.float32))) / (size if r else 1)
            for g, r in zip(leaves, rep)
        )
    else:
        sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves)
    if psum_axis is not None:
        sq = jax.lax.psum(sq, psum_axis)
    return jnp.sqrt(sq)


def clip_by_global_norm(
    grads: PyTree, max_norm: float, psum_axis=None, replicated: PyTree = None
) -> Tuple[PyTree, jax.Array]:
    """Scale grads so the global L2 norm is at most ``max_norm``."""
    gnorm = global_norm(grads, psum_axis, replicated)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-20))
    return jax.tree_util.tree_map(lambda g: g * scale.astype(g.dtype), grads), gnorm


def warmup_lr(lr: float, step: jax.Array, warmup_steps: int) -> jax.Array:
    """lr = 0 during warm-up, then constant (``class_CUDA/lstm.cc:364-367``)."""
    if warmup_steps <= 0:
        return jnp.asarray(lr, jnp.float32)
    return jnp.where(step < warmup_steps, 0.0, lr).astype(jnp.float32)


def schedule_lr(cfg: TrainConfig, step: jax.Array) -> jax.Array:
    """The full lr schedule: warm-up, then (optionally) a cyclical decay.

    The reference's only schedule is the lr=0 warm-up
    (``class_CUDA/lstm.cc:364-367``). ``lr_cycle_steps > 0`` adds SWA's
    prescribed cyclical schedule (Izmailov et al. 2018): within each cycle of
    that many post-warmup steps, lr decays linearly from ``cfg.lr`` down to
    ``cfg.lr * lr_cycle_min_frac``, then jumps back — snapshots taken at the
    cycle minima explore the loss basin and average into a flatter point.
    """
    lr = warmup_lr(cfg.lr, step, cfg.warmup_steps)
    if cfg.lr_cycle_steps > 0:
        t = jnp.mod(
            jnp.maximum(step - cfg.warmup_steps, 0), cfg.lr_cycle_steps
        ).astype(jnp.float32) / float(cfg.lr_cycle_steps)
        frac = 1.0 - (1.0 - cfg.lr_cycle_min_frac) * t
        lr = lr * frac
    return lr


def adagrad_update(
    params: PyTree,
    grads: PyTree,
    m: PyTree,
    lr: jax.Array,
    eps: float = 1e-10,
) -> Tuple[PyTree, PyTree]:
    """One Adagrad step. Returns (new_params, new_m)."""
    new_m = jax.tree_util.tree_map(
        lambda mm, g: (mm.astype(jnp.float32) + jnp.square(g.astype(jnp.float32))).astype(mm.dtype),
        m,
        grads,
    )
    new_params = jax.tree_util.tree_map(
        lambda p, g, mm: (
            p.astype(jnp.float32)
            - lr * g.astype(jnp.float32) * jax.lax.rsqrt(mm.astype(jnp.float32) + eps)
        ).astype(p.dtype),
        params,
        grads,
        new_m,
    )
    return new_params, new_m


def apply_updates(
    params: PyTree,
    grads: PyTree,
    m: PyTree,
    step: jax.Array,
    cfg: TrainConfig,
    psum_axis=None,
    replicated: PyTree = None,
) -> Tuple[PyTree, PyTree, jax.Array]:
    """Full optimizer pipeline: clip → warm-up LR → Adagrad.
    Returns (params, m, grad_norm). ``psum_axis``: mesh axis over which the
    parameters are *sharded* (TP) — norms are summed across it;
    ``replicated`` marks the leaves that are not (see ``global_norm``)."""
    if cfg.clip_norm is not None:
        grads, gnorm = clip_by_global_norm(grads, cfg.clip_norm, psum_axis, replicated)
    else:
        gnorm = global_norm(grads, psum_axis, replicated)
    lr = schedule_lr(cfg, step)
    params, m = adagrad_update(params, grads, m, lr, cfg.adagrad_eps)
    return params, m, gnorm
