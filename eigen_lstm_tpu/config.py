"""Typed configuration for the TPU-native Eigen-LSTM rebuild.

The reference hardcodes every hyperparameter as ``const size_t`` in ``main()``
(``/root/reference/optimized-obsfuscated_versions/lstm_eigen_class_CUDA/lstm.cc:56-75``)
and switches behavior with compile-time flags (``USE_BLAS``, ``PRECISE_MATH``,
``GPU_MODE``). The rebuild replaces that with small frozen dataclasses consumed
by the model / trainer / data layers and a CLI (``eigen_lstm_tpu/cli.py``).

Reference-quirk knobs (each cites where the reference pins the behavior):

* ``cell_variant``: the reference destructively squashes the cell state,
  ``c_t <- tanh(c_t)``, and carries the *squashed* cell to the next step
  (root ``lstm.cc:189``; ``lstm_eigen_class/lstm.h:95``;
  ``class_CUDA/cu_lstm.h:177``). ``"reference"`` reproduces that;
  ``"standard"`` is the textbook cell (raw cell carried, ``h = o*tanh(c)``).
* ``loss_mode``: the batched variants count loss only on the final timestep
  (``class_batch/lstm.cc:308-317``), the segment trainer counts all steps
  (``lstm_segment.cc:197-206``).
* ``loss_base``: root trainer uses -log2 p (``lstm.cc:204``), class variants
  use -ln p (``class/lstm.h:121-122``) while still reporting "bits/char".
  Metrics here are always reported in bits; this knob only controls the
  *training* objective scale to match a chosen reference variant.
* ``forget_bias``: batch/final variants initialize the forget-gate bias to 1,
  citing Jozefowicz'15 (``class_batch/lstm.cc:80-81``).
* ``adagrad_eps``: 1e-10 in root ``lstm.cc:25`` and the fused CUDA kernel
  (``class_CUDA/cu_kernels.cu:202-204``); 1e-4 in ``lstm_eigen_CUDA/lstm.cu:84``.
* ``warmup_steps``: the final driver holds lr=0 for the first ``50*S``
  iterations (``class_CUDA/lstm.cc:364-367``).
* ``reset_std``: fresh-stream h0/c0 init sigma, ranging over
  {0.1, 0.01, 0.0} across variants (root ``lstm.cc:146-147``,
  ``class/lstm.cc:86-87``, ``class_CUDA/lstm.cc:45``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float64": jnp.float64}


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture + numerics of the stacked char-LSTM LM."""

    vocab: int = 256              # M: byte vocabulary (one-hot dim), root lstm.cc:53
    hidden: int = 512             # N per layer
    num_layers: int = 1           # reference is always 1-layer; rebuild supports stacks
    cell_variant: str = "reference"   # "reference" | "standard" (see module docstring)
    loss_mode: str = "last"       # "last" | "all"
    loss_base: str = "e"          # "e" | "2" — training objective log base
    param_dtype: str = "float32"
    compute_dtype: str = "float32"    # "bfloat16" for MXU mixed precision
    init_std: float = 0.01        # W,U,Why ~ N(0, 0.01), root lstm.cc:113-115
    forget_bias: float = 1.0      # class_batch/lstm.cc:80-81
    embedding_mode: str = "auto"  # "auto" | "gather" | "onehot"
    # The reference's W·x with one-hot x IS a gather (root lstm.cc:169), but
    # a gather's *backward* is a scatter-add, which lowers poorly on TPU.
    # "auto": gather forward (zero FLOPs) + one-hot GEMM backward (custom
    # VJP); "onehot": GEMM both ways; "gather": gather fwd + scatter bwd.
    remat: bool = False           # rematerialize scan activations in BPTT
    # (jax.checkpoint over the per-step cell; trades recompute for HBM at
    # long S / large N — SURVEY.md §7 "Backward memory over S")
    residual_dtype: str = "float32"  # dtype of stored BPTT residuals
    # (h/c/gate sequences) in the Pallas path; "bfloat16" halves the HBM
    # traffic of the recurrence at a small gradient-precision cost. The
    # in-flight carry stays fp32 in VMEM either way.
    scan_chunk: int = 0           # long-window residual tiling: split the
    # S-step recurrence into scan_chunk-step chunks with jax.checkpoint
    # around each — only the chunk being differentiated holds its (S', B,
    # 4N) gate residuals, shrinking the residual working set S/scan_chunk-
    # fold at the cost of one extra forward pass per chunk. Targets the
    # measured S>=1000 slowdown (docs/PERFORMANCE.md long-context: both
    # kernels run ~25% more ns/char once the per-window residual streams
    # reach ~0.5 GB). 0 = off. Applies to any cell backend (XLA or Pallas).
    tie_embeddings: bool = False  # share the softmax head Why (N, M) as the
    # input embedding: layer 0 consumes e_t = Why^T[id] (N-dim) through a
    # (N, 4N) input projection instead of a separate (M, 4N) one-hot weight.
    # Implemented as the in-graph substitution W_eff = Why^T @ W0 (an
    # (M, 4N) GEMM, tiny), so the one-hot/gather embedding machinery and the
    # fused-embed Pallas kernel run unchanged and AD chains dW_eff into both
    # Why and W0. A rebuild extension (the reference always unties); a
    # regularization lever for corpora far smaller than enwik8 — note at
    # N >> M it trades the (M, 4N) embed for a larger (N, 4N) projection.
    # Supported everywhere except pipeline parallelism (PP stages the head
    # and the embedding onto different devices); TP shards the substitution
    # (parallel/tp.py tp_stack_forward).
    dropout: float = 0.0          # inter-layer + pre-head dropout rate
    # (training only; eval/sampling always run the full net). The reference
    # has no regularization of any kind (SURVEY.md §2.2) — this is a rebuild
    # extension for held-out quality on corpora far smaller than enwik8.
    # Applied to the non-recurrent connections only (between stacked layers
    # and before the softmax head, the Zaremba'14 recipe); the recurrent
    # h->h path is untouched so the Pallas recurrence kernels are unaffected.
    seed: int = 0

    def __post_init__(self):
        assert self.cell_variant in ("reference", "standard"), self.cell_variant
        assert self.loss_mode in ("last", "all"), self.loss_mode
        assert self.loss_base in ("e", "2"), self.loss_base
        assert self.embedding_mode in ("auto", "gather", "onehot"), self.embedding_mode
        assert 0.0 <= self.dropout < 1.0, self.dropout

    @property
    def pdtype(self):
        return _DTYPES[self.param_dtype]

    @property
    def cdtype(self):
        return _DTYPES[self.compute_dtype]

    @property
    def adtype(self):
        """Accumulation/eltwise dtype: fp32 everywhere except the float64
        CPU-oracle configuration used by the gradcheck suite."""
        return jnp.float64 if self.param_dtype == "float64" else jnp.float32


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Corpus + batching. Mirrors the stream-cursor scheme of
    ``class_batch/lstm.cc:150-156,279-302`` (B independent cursors, windows of
    S bytes, advance by ``stride``) with ``stride=1`` (sliding, batch variant)
    or ``stride=S`` / ``S//2`` (segment variant, ``lstm_segment.cc:110``)."""

    path: str = "data/alice29.txt"
    train_percent: float = 0.95   # 95/5 split class_batch/lstm.cc:54-59; 99/1 final
    batch: int = 128              # B concurrent streams
    seq: int = 100                # S: truncated-BPTT window
    stride: Optional[int] = None  # None -> seq (non-overlapping segments, state carry)
    carry_state: bool = True      # carry h/c across windows (lstm_segment.cc:183-187)
    reset_std: float = 0.0        # h0/c0 ~ N(0, reset_std) on stream reset

    @property
    def effective_stride(self) -> int:
        return self.seq if self.stride is None else self.stride


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization + schedule. Adagrad is the reference's only optimizer
    (root ``lstm.cc:261-272``)."""

    lr: float = 0.1               # root lstm.cc:59
    adagrad_eps: float = 1e-10    # root lstm.cc:25
    clip_norm: Optional[float] = None  # global-norm clip; reference has none
    warmup_steps: int = 0         # lr=0 for this many steps (class_CUDA lstm.cc:364-367)
    lr_cycle_steps: int = 0       # >0: post-warmup cyclical lr — within each
    # cycle lr decays linearly from lr to lr*lr_cycle_min_frac, then resets
    # (SWA's prescription, Izmailov et al. 2018; the reference has no
    # schedule beyond warmup). Pair with keep_snapshots + an eval cadence
    # near the cycle length so scripts/swa.py averages near-minima iterates.
    lr_cycle_min_frac: float = 0.1
    skip_nonfinite: bool = True   # skip the update on a non-finite loss —
    # the reference silently skips NaN losses (cu_lstm.h:210-211); here the
    # *update* is skipped (grads zeroed) so training state stays clean
    steps: int = 10_000
    log_every: int = 100          # progress cadence, root lstm.cc:274-279
    eval_every_s: float = 60.0    # timed eval cadence, class_batch lstm.cc:168
    eval_chars: int = 100_000     # cap on held-out bytes scored per eval
    sample_chars: int = 1000      # chars sampled per report, root lstm.cc:293
    checkpoint_dir: Optional[str] = None
    superstep: int = 50           # inner jitted steps per host round-trip
    pp_chunks: int = 4            # pipeline microbatch chunks (must divide seq)
    crosscheck_every: Optional[int] = None  # run the pallas-vs-xla runtime
    # lockstep compare every this many supersteps (reference runs Eigen and
    # CUDA side by side every step, lstm_eigen_CUDA/lstm.cu:425-496)
    gradcheck_every: Optional[int] = None  # run the finite-difference
    # gradient oracle on the live training point every this many supersteps —
    # the reference's per-epoch mid-training gradcheck
    # (lstm_eigen_class/lstm.cc:114-115,146; class_batch/lstm.cc:323-337)
    gradcheck_samples: int = 20   # FD samples per tensor on the cadence
    # (the startup --gradcheck uses more; class_batch/lstm.h:203-245 uses 100)
    keep_snapshots: bool = False  # also retain ckpt_step{N}.npz at every
    # timed eval (beyond the reference's rolling save,
    # class_CUDA/lstm.cc:224-228) — material for tail weight averaging
    # (scripts/swa.py)
    seed: int = 1234


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Data-parallel mesh. The reference is strictly single-device
    (SURVEY.md §2.4); DP over ICI is new capability per BASELINE.json."""

    data_axis: str = "data"
    num_devices: Optional[int] = None  # None -> all local devices
