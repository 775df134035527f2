"""Text sampling from a trained model — the reference's ``sample()``
(``class_CUDA/lstm.cc:578-659``), redesigned as a single jitted
``lax.scan`` on device.

The reference samples one char at a time on the host with an explicit CDF
cumsum + linear scan (``lstm.cc:613-631``); here the whole n-char generation
is one device program using ``jax.random.categorical`` — no per-char
host↔device roundtrip (each costs ~45 ms over a tunneled TPU).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import lstm as model


def sample_ids(
    params: model.LSTMParams,
    cfg: ModelConfig,
    key: jax.Array,
    first: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    length: int,
    temperature: float = 1.0,
    backend: str = "auto",
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Generate ``length`` ids per stream. Returns ((length, B) ids, state).

    ``backend="auto"`` uses the fused Pallas generation kernel
    (ops/pallas_sampler.py) on TPU when the model fits its VMEM gate —
    the XLA scan is latency-chain bound per token; "xla" forces the scan."""
    if cfg.tie_embeddings:
        # hoist the tied substitution (Why^T @ W0) out of the per-token
        # loop: done once here, every downstream path (fused kernel packing,
        # the XLA scan's forward_step) sees ordinary untied params
        params = model._substitute_tied_embed(params, cfg)
        cfg = dataclasses.replace(cfg, tie_embeddings=False)
    if backend in ("auto", "pallas"):
        import jax as _jax

        from ..ops import pallas_sampler as ps

        on_tpu = _jax.devices()[0].platform == "tpu"
        ok = (
            ps.supported(cfg, int(first.shape[0]), length)
            and (on_tpu or backend == "pallas")
        )
        if ok:
            return ps.pallas_sample_ids(
                params, cfg, key, first, h0, c0, length, temperature
            )
        if backend == "pallas":
            raise ValueError("fused sampler unsupported for this config")
    return _sample_ids_xla(params, cfg, key, first, h0, c0, length, temperature)


@functools.partial(jax.jit, static_argnames=("cfg", "length", "temperature"))
def _sample_ids_xla(
    params: model.LSTMParams,
    cfg: ModelConfig,
    key: jax.Array,
    first: jax.Array,        # (B,) int32 — priming character per stream
    h0: jax.Array,           # (L, B, N)
    c0: jax.Array,           # (L, B, N)
    length: int,
    temperature: float = 1.0,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Generate ``length`` ids per stream. Returns ((length, B) ids, state)."""

    greedy = temperature == 0.0
    inv_t = 0.0 if greedy else 1.0 / temperature

    # hoist the loop-invariant weight casts out of the scan: at bf16 compute
    # the fp32->bf16 converts of W/U/Why would otherwise run every step
    if cfg.compute_dtype != cfg.param_dtype:
        params = jax.tree_util.tree_map(lambda p: p.astype(cfg.cdtype), params)

    def step(carry, _):
        ch, h, c, k = carry
        logits, (h, c) = model.forward_step(params, ch, h, c, cfg)
        k, sub = jax.random.split(k)
        if greedy:
            # argmax decoding (the reference's cublasIsamax path,
            # class_CUDA/cu_matrix.cu:377-395)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            nxt = jax.random.categorical(sub, logits * inv_t, axis=-1).astype(jnp.int32)
        return (nxt, h, c, k), nxt

    (_, hT, cT, _), ids = jax.lax.scan(
        step, (first, h0, c0, key), None, length=length
    )
    return ids, (hT, cT)


def sample_text(
    params: model.LSTMParams,
    cfg: ModelConfig,
    key: jax.Array,
    length: int = 1000,
    prime: bytes = b"\n",
    temperature: float = 1.0,
) -> str:
    """Host convenience: prime with a byte string, generate, decode latin-1
    (byte-transparent). Mirrors the per-epoch sample dumps the reference
    writes to ``models/*_sample.txt`` (``class_CUDA/lstm.cc:230-235``)."""
    if cfg.tie_embeddings:
        # substitute once for the prime loop; sample_ids then sees untied
        params = model._substitute_tied_embed(params, cfg)
        cfg = dataclasses.replace(cfg, tie_embeddings=False)
    h, c = model.init_state(cfg, 1)
    # feed the priming bytes (all but last) to warm the state
    for byte in prime[:-1]:
        _, (h, c) = model.forward_step(
            params, jnp.asarray([byte], jnp.int32), h, c, cfg
        )
    first = jnp.asarray([prime[-1]], jnp.int32)
    ids, _ = sample_ids(params, cfg, key, first, h, c, length, temperature)
    return bytes(int(i) for i in ids[:, 0]).decode("latin-1")
