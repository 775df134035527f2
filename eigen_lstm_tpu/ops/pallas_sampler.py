"""Fused Pallas generation kernel: the entire n-token sampling loop in one
kernel with all weights resident in VMEM.

The XLA-scan sampler (models/sampler.py) is latency-chain bound: each token
is a chain of small HLOs (embed gather, h@U, cell, h@Why, categorical) whose
VMEM round-trips serialize (~52 us/token at H=512 B=128, ROADMAP r1 item 3).
Here one kernel holds the stacked input+recurrent weight [W; U], the head
Why/by, and the running (h, c) in VMEM for the whole generation; each grid
step is: one-hot(prev)++h -> one MXU matmul -> cell epilogue -> head matmul
-> Gumbel-max draw (on-core PRNG) -> write the token.

Sampling uses the Gumbel-max identity (argmax(logits/T + G) ~ Categorical
(softmax(logits/T))) instead of the reference's host-side CDF cumsum + linear
scan (``class_CUDA/lstm.cc:613-631``) — an argmax over the 256-lane vocab
axis is one VPU reduction. Greedy (T=0) is an exact argmax, bitwise
comparable to the XLA sampler (tests/test_pallas_sampler.py); stochastic
draws use a counter-based hash RNG (murmur3 finalizer over (seed, step,
element)) in plain VPU integer ops — deterministic given the key,
platform-independent (same bits in interpret mode and on TPU), but a
different stream than jax.random.categorical, so sequences are compared
distributionally, not bitwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from .pallas_cell import _cell_fwd, _fmix32, _prec, _shr, _use_interpret


def _gen_kernel(n, m, n_layers, dmax, variant, cdtype, greedy, inv_t,
                seed_ref, WU_ref, b_ref, Why_ref, by_ref,
                first_ref, h0_ref, c0_ref,
                ids_ref, hT_ref, cT_ref,
                h_s, c_s, ch_s, xh_s):
    t = pl.program_id(0)
    b_sz = ch_s.shape[0]

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:].astype(jnp.float32)
        c_s[:] = c0_ref[:].astype(jnp.float32)
        ch_s[:] = first_ref[:]
        # the padded tail of xh (beyond any layer's input width) multiplies
        # zero weight rows, but uninitialized bf16 garbage can be NaN and
        # NaN * 0 = NaN — zero the scratch once
        xh_s[:] = jnp.zeros_like(xh_s)

    cols = jax.lax.broadcasted_iota(jnp.int32, (b_sz, m), 1)
    # everything stays in (B, 1)-column layout: (B,) sublane vectors would
    # force a cross-layout relayout every step
    h = None
    for l in range(n_layers):
        if l == 0:
            xh_s[:, :m] = (cols == ch_s[:]).astype(cdtype)
            xh_s[:, m : m + n] = h_s[l].astype(cdtype)
        else:
            xh_s[:, :n] = h.astype(cdtype)
            xh_s[:, n : 2 * n] = h_s[l].astype(cdtype)
        g_pre = (
            jnp.dot(xh_s[:], WU_ref[l], preferred_element_type=jnp.float32,
                    precision=_prec(cdtype))
            + b_ref[l]
        )
        iof = jax.nn.sigmoid(g_pre[:, : 3 * n])
        u = jnp.tanh(g_pre[:, 3 * n :])
        h, c_carry = _cell_fwd(
            iof[:, :n], iof[:, n : 2 * n], iof[:, 2 * n : 3 * n], u,
            c_s[l], variant,
        )
        h_s[l] = h
        c_s[l] = c_carry

    logits = (
        jnp.dot(h.astype(cdtype), Why_ref[:], preferred_element_type=jnp.float32,
                precision=_prec(cdtype))
        + by_ref[:]
    )
    if greedy:
        scores = logits
    else:
        # counter-based uniform bits: hash of (seed, step) x element index
        base = _fmix32(
            seed_ref[0].astype(jnp.uint32)
            ^ (t.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
        )
        rows = jax.lax.broadcasted_iota(jnp.uint32, (b_sz, m), 0)
        lanes = jax.lax.broadcasted_iota(jnp.uint32, (b_sz, m), 1)
        bits = _fmix32((rows * jnp.uint32(m) + lanes) * jnp.uint32(0x85EBCA6B) ^ base)
        # 24 high bits -> uniform in (0, 1), clamped away from 0 for the log.
        # Mosaic lacks a uint32->f32 cast; bitcast to int32 is exact here
        # (the top 8 bits are zero after the shift).
        uni = jax.lax.bitcast_convert_type(_shr(bits, 8), jnp.int32).astype(
            jnp.float32
        ) * (1.0 / (1 << 24))
        uni = jnp.maximum(uni, 1e-7)
        gumbel = -jnp.log(-jnp.log(uni))
        scores = logits * inv_t + gumbel
    # first-argmax via max + masked min-index: plain VPU lane reductions
    # (jnp.argmax lowers poorly in Mosaic); keepdims keeps (B, 1) layout
    mx = jnp.max(scores, axis=-1, keepdims=True)
    nxt = jnp.min(
        jnp.where(scores >= mx, cols, m), axis=-1, keepdims=True
    ).astype(jnp.int32)
    # ids are written into (B, 128) pages via a masked select (dynamic
    # lane-offset stores must be 128-aligned, which t is not); the page's
    # block index advances every 128 steps, so Pallas flushes each full page
    lane = jax.lax.broadcasted_iota(jnp.int32, (b_sz, 128), 1)
    ids_ref[:] = jnp.where(lane == (t % 128), nxt, ids_ref[:])
    ch_s[:] = nxt
    hT_ref[:] = h_s[:]
    cT_ref[:] = c_s[:]


def supported(cfg: ModelConfig, batch: int, length: int) -> bool:
    """VMEM gate: every layer's padded [W; U] + head + ids pages must fit."""
    n, m, L = cfg.hidden, cfg.vocab, cfg.num_layers
    if n % 128 != 0 or m % 128 != 0 or batch % 8 != 0:
        return False
    dmax = max(m + n, 2 * n)
    cbytes = 2 if cfg.compute_dtype == "bfloat16" else 4
    total = (
        L * dmax * 4 * n * cbytes      # padded per-layer [W; U] stack
        + n * m * cbytes + 4 * m       # head
        + length * batch * 4           # resident ids output
        + batch * (2 * L * n * 4 + dmax * cbytes + 4 * m)  # state + scratch
    )
    return total <= 13 * 1024 * 1024


@functools.lru_cache(maxsize=32)
def _make_gen(length: int, b: int, n: int, m: int, n_layers: int,
              variant: str, cdtype_name: str, greedy: bool, inv_t: float,
              interpret: bool):
    cdtype = jnp.dtype(cdtype_name).type
    f32 = jnp.float32
    length_pad = -(-length // 128) * 128
    dmax = max(m + n, 2 * n)

    def call(seed, WU, bvec, Why, by, first, h0, c0):
        return pl.pallas_call(
            functools.partial(
                _gen_kernel, n, m, n_layers, dmax, variant, cdtype, greedy,
                inv_t
            ),
            grid=(length,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((n_layers, dmax, 4 * n), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_layers, 1, 4 * n), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, m), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),      # first (B,1)
                pl.BlockSpec((n_layers, b, n), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_layers, b, n), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((b, 128), lambda t: (0, t // 128), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_layers, b, n), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_layers, b, n), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, length_pad), jnp.int32),
                jax.ShapeDtypeStruct((n_layers, b, n), f32),
                jax.ShapeDtypeStruct((n_layers, b, n), f32),
            ],
            scratch_shapes=[
                pltpu.VMEM((n_layers, b, n), f32),
                pltpu.VMEM((n_layers, b, n), f32),
                pltpu.VMEM((b, 1), jnp.int32),
                pltpu.VMEM((b, dmax), cdtype),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * length * b * ((m + n) * 4 * n + n * m),
                bytes_accessed=(m + n) * 4 * n * 4 + n * m * 4 + length * b * 4,
                transcendentals=length * b * (5 * n + 2 * m),
            ),
            interpret=interpret,
        )(seed, WU, bvec, Why, by, first, h0, c0)

    return call


@functools.partial(
    jax.jit, static_argnames=("cfg", "length", "temperature")
)
def pallas_sample_ids(params, cfg: ModelConfig, key, first, h0, c0,
                      length: int, temperature: float = 1.0):
    """Fused generation for stacked models. Same contract as
    sampler.sample_ids: returns ((length, B) ids, (hT, cT)) with state
    shaped (L, B, N). Per-layer [W; U] stacks are zero-padded to a common
    input width so one resident (L, Dmax, 4N) tensor serves every layer.
    Jitted end-to-end: the wrapper's prep ops (weight stacking, casts, key
    derivation) would otherwise dispatch eagerly — ~45 ms per op over the
    tunneled TPU."""
    b = first.shape[0]
    n, m, L = cfg.hidden, cfg.vocab, cfg.num_layers
    dmax = max(m + n, 2 * n)
    greedy = temperature == 0.0
    inv_t = 0.0 if greedy else 1.0 / float(temperature)
    call = _make_gen(
        length, b, n, m, L, cfg.cell_variant, jnp.dtype(cfg.cdtype).name,
        greedy, inv_t, _use_interpret(),
    )
    wu_pad = []
    for layer in params.layers:
        wu = jnp.concatenate([layer.W, layer.U], axis=0).astype(cfg.cdtype)
        wu_pad.append(
            jnp.pad(wu, ((0, dmax - wu.shape[0]), (0, 0)))
        )
    WU = jnp.stack(wu_pad)
    bvec = jnp.stack(
        [l.b.astype(jnp.float32).reshape(1, 4 * n) for l in params.layers]
    )
    Why = params.Why.astype(cfg.cdtype)
    by = params.by.astype(jnp.float32).reshape(1, m)
    seed = jax.random.bits(key, (), jnp.uint32).astype(jnp.int32)
    ids, hT, cT = call(
        seed.reshape(1), WU, bvec, Why, by,
        first.reshape(b, 1).astype(jnp.int32),
        h0.astype(jnp.float32), c0.astype(jnp.float32),
    )
    # one transpose + unpad outside the kernel
    return ids.T[:length], (hT.astype(cfg.pdtype), cT.astype(cfg.pdtype))
