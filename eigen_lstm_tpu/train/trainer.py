"""Training loop — L4 of the reference layer map (SURVEY.md §1), TPU-native.

Reference: epochs × chars loop with per-character window build → forward →
loss → BPTT → Adagrad → periodic eval/sample/checkpoint/log
(root ``lstm.cc:142-357``; ``class_CUDA/lstm.cc:167-387``).

TPU-native redesign (the big structural win, SURVEY.md §3.3): the entire
inner loop — window gather, forward, loss, BPTT, optimizer update, cursor
advance, stream-state carry/reset — is one jitted ``lax.scan`` over
``superstep`` inner steps with donated buffers. The host wakes up once per
superstep for metrics, and on a wall-clock cadence for eval / sample /
checkpoint (the reference's 60 s / 900 s timed-eval pattern,
``class_batch/lstm.cc:168-244``, ``class_CUDA/lstm.cc:188-238``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DataConfig, ModelConfig, TrainConfig
from ..data import corpus as corpus_mod
from ..models import lstm as model
from ..models import sampler as sampler_mod
from . import checkpoint as ckpt_mod
from . import evaluator as eval_mod
from . import metrics as metrics_mod
from . import optimizer as opt_mod


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Everything the jitted superstep carries: parameters, Adagrad
    accumulators, per-stream recurrent state, data cursors, step counter and
    RNG key (the reference keeps the analogous state in main()'s locals,
    ``class_CUDA/lstm.cc:56-165``)."""

    params: model.LSTMParams
    m: Any                      # Adagrad accumulators (same pytree as params)
    h: jax.Array                # (L, B, N)
    c: jax.Array                # (L, B, N)
    positions: jax.Array        # (B,) int32
    step: jax.Array             # () int32 — global step
    key: jax.Array              # PRNG key (stream resets)


def _make_inner(
    mcfg: ModelConfig,
    dcfg: DataConfig,
    tcfg: TrainConfig,
    length: int,
    cell_fn,
    window_fn,
    loss_grad_fn=None,
    reset_fold_axes: tuple = (),
    opt_kwargs: Optional[dict] = None,
):
    """One training step as a ``lax.scan`` body. ``window_fn(state, xs)``
    supplies the (x, t) int32 windows — gathered in-jit from a resident
    corpus, or taken from a host-streamed per-step batch (data/streaming.py).
    ``loss_grad_fn(params, x, t, h, c)`` overrides the model/grad evaluation
    (sequence pipelining substitutes its time-sharded loss, parallel/sp.py).
    ``reset_fold_axes``: mesh axes whose index is folded into the stream-
    reset RNG so shards holding different batch slices draw decorrelated
    reset noise (the DP convention, parallel/dp.py).
    Everything else (BPTT, non-finite guard, cursor advance, stream carry,
    Adagrad) is shared so every data/parallel path using this builder is
    trajectory-identical."""

    stride = dcfg.effective_stride
    seq = dcfg.seq
    use_dropout = mcfg.dropout > 0.0
    if loss_grad_fn is None:
        def loss_grad_fn(params, x, t, h, c, dropout_key=None):
            return jax.value_and_grad(model.loss_fn, has_aux=True)(
                params, x, t, h, c, mcfg, cell_fn, dropout_key
            )
    # custom loss_grad_fns (the SP family, parallel/sp.py) take the same
    # trailing ``dropout_key`` and plumb mode-appropriate mask streams

    def inner(state: TrainState, xs) -> Tuple[TrainState, Tuple[jax.Array, jax.Array]]:
        x, t = window_fn(state, xs)
        if use_dropout:
            # per-step mask stream derived without consuming the carried key
            # (the reset RNG trajectory stays identical to dropout=0 runs)
            dkey = jax.random.fold_in(state.key, state.step)
            (loss, ((h2, c2), bits)), grads = loss_grad_fn(
                state.params, x, t, state.h, state.c, dkey
            )
        else:
            (loss, ((h2, c2), bits)), grads = loss_grad_fn(
                state.params, x, t, state.h, state.c
            )
        if tcfg.skip_nonfinite:
            # reference skips NaN losses silently (cu_lstm.h:210-211); we
            # zero the grads so the Adagrad update is a no-op that step, and
            # keep the pre-step recurrent state so one bad step can't poison
            # every stream's hidden state until it wraps
            finite = jnp.isfinite(loss)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
            )
            h2 = jnp.where(finite, h2, state.h.astype(h2.dtype))
            c2 = jnp.where(finite, c2, state.c.astype(c2.dtype))
        newpos, wrapped = corpus_mod.advance_positions(
            state.positions, stride, length, seq
        )
        if dcfg.carry_state:
            key, sub = jax.random.split(state.key)
            mask = wrapped[None, :, None]
            if dcfg.reset_std > 0.0:
                for ax in reset_fold_axes:
                    sub = jax.random.fold_in(sub, jax.lax.axis_index(ax))
                kh, kc = jax.random.split(sub)
                rh = jax.random.normal(kh, h2.shape, h2.dtype) * dcfg.reset_std
                rc = jax.random.normal(kc, c2.shape, c2.dtype) * dcfg.reset_std
            else:
                rh = jnp.zeros_like(h2)
                rc = jnp.zeros_like(c2)
            h2 = jnp.where(mask, rh, h2)
            c2 = jnp.where(mask, rc, c2)
        else:
            key = state.key
            h2 = jnp.zeros_like(state.h)
            c2 = jnp.zeros_like(state.c)
        params, m, gnorm = opt_mod.apply_updates(
            state.params, grads, state.m, state.step, tcfg,
            **(opt_kwargs or {}),
        )
        new_state = TrainState(
            params, m, h2, c2, newpos, state.step + 1, key
        )
        return new_state, (bits, gnorm)

    return inner


def _scan_metrics(bits, gnorms):
    return {
        "bits_mean": jnp.mean(bits),
        "bits_last": bits[-1],
        "gnorm_mean": jnp.mean(gnorms),
        # spike detector: one pathological batch inside a superstep is
        # invisible in the means but (with clipping off, the reference's
        # default) permanently poisons Adagrad's accumulator — this is what
        # cost the round-5 flagship +0.16 held-out bpc between its 162.5k
        # and 195k evals (NORTHSTAR.md round-5 incident note)
        "gnorm_max": jnp.max(gnorms),
    }


def make_superstep(
    mcfg: ModelConfig,
    dcfg: DataConfig,
    tcfg: TrainConfig,
    corpus: jax.Array,
    cell_fn=None,
    donate: bool = True,
) -> Callable[[TrainState], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the jitted K-step training superstep over a device-resident
    corpus. Returns ``superstep(state) -> (state, metrics)`` where metrics
    are means over the K inner steps."""

    length = int(corpus.shape[0])

    def window_fn(state, _):
        return corpus_mod.make_windows(corpus, state.positions, dcfg.seq)

    inner = _make_inner(mcfg, dcfg, tcfg, length, cell_fn, window_fn)

    def superstep(state: TrainState):
        state, (bits, gnorms) = jax.lax.scan(
            inner, state, None, length=tcfg.superstep
        )
        return state, _scan_metrics(bits, gnorms)

    return jax.jit(superstep, donate_argnums=(0,) if donate else ())


def make_streamed_superstep(
    mcfg: ModelConfig,
    dcfg: DataConfig,
    tcfg: TrainConfig,
    length: int,
    cell_fn=None,
    donate: bool = True,
):
    """Superstep variant fed by host-streamed windows (data/streaming.py):
    ``superstep(state, windows)`` where ``windows`` is the feeder's
    (K, S+1, B) uint8 batch. Cursors still advance in-jit (same pure
    function over the same ``length``), keeping checkpoints interchangeable
    with the resident path."""

    def window_fn(state, win):
        w = win.astype(jnp.int32)
        return w[:-1], w[1:]

    inner = _make_inner(mcfg, dcfg, tcfg, length, cell_fn, window_fn)

    def superstep(state: TrainState, windows: jax.Array):
        state, (bits, gnorms) = jax.lax.scan(inner, state, windows)
        return state, _scan_metrics(bits, gnorms)

    return jax.jit(superstep, donate_argnums=(0,) if donate else ())


def _select_tp_backend(mcfg, batch, ndev, cell_fn, allow_per_step=True):
    """One selection ladder for every TP-bearing mesh: prefer the
    sequence-level kernel (U shard VMEM-resident, in-kernel ICI exchange —
    ops/pallas_tp_seq.py; EIGEN_LSTM_TP_SEQ=0 opts out), else the fused
    per-step kernel where allowed, else the XLA scan. ``batch`` is the
    per-data-shard batch the kernel will actually see."""
    if cell_fn is not None and os.environ.get("EIGEN_LSTM_TP_SEQ", "1") != "0":
        from ..ops.pallas_tp_seq import tp_seq_supported

        if tp_seq_supported(mcfg, batch, ndev):
            return "pallas_seq"
    if allow_per_step and cell_fn is not None:
        from ..ops.pallas_tp_cell import tp_pallas_supported

        if tp_pallas_supported(mcfg, batch, ndev):
            return "pallas"
    return "xla"


class Trainer:
    """Host-side driver: owns the superstep, the timed eval/sample/checkpoint
    cadence, and the results table (reference L4/L5)."""

    def __init__(
        self,
        mcfg: ModelConfig,
        dcfg: DataConfig,
        tcfg: TrainConfig,
        train_data: np.ndarray,
        test_data: Optional[np.ndarray] = None,
        cell_fn=None,
        results_path: Optional[str] = None,
        mesh=None,
        mesh_axis: str = "data",
        parallel: str = "dp",
        streaming: bool = False,
    ):
        """``mesh``: optional ``jax.sharding.Mesh``. ``parallel="dp"`` trains
        data-parallel over ``mesh_axis`` (shard_map + psum, parallel/dp.py;
        the global batch is split across devices); ``parallel="tp"`` trains
        tensor-parallel (gate-sharded weights, parallel/tp.py; every device
        sees the full batch, weights are sharded); ``parallel="dp_tp"``
        trains on a 2-D ("data", "model") mesh (parallel/dp_tp.py);
        ``parallel="pp"`` pipelines layer blocks across a stage mesh
        (parallel/pp.py — num_layers must divide by the mesh size).

        ``streaming=True`` keeps the corpus on the host (pass a memmap via
        ``streaming.load_corpus_mmap`` for corpora that rival HBM) and feeds
        windows per superstep, double-buffered (data/streaming.py)."""
        self.mcfg, self.dcfg, self.tcfg = mcfg, dcfg, tcfg
        if mcfg.tie_embeddings and mesh is not None and parallel in ("pp", "dp_pp"):
            # PP stages layer 0 and the head onto different devices — the
            # tied weight cannot be shared across stages without replicating
            # Why through the ring. Every other mode routes through
            # models.lstm.forward (single-device, DP, SP families) or the
            # TP layer-0 substitution (tp_stack_forward).
            raise ValueError(
                "tie_embeddings is not supported under pipeline parallelism "
                f"(parallel={parallel!r}): the head and the embedding live "
                "on different stages"
            )
        self.train_np = train_data
        self.test_np = test_data
        self.cell_fn = cell_fn
        self.crosscheck_failures = 0
        self.gradcheck_failures = 0
        self._best_bpc = None   # seeded lazily by _best_test_bpc()
        self.feeder = None
        self._next_windows = None
        self._windows_sharding = None
        if streaming:
            self.corpus = None
        else:
            self.corpus = jnp.asarray(train_data)
        # streamed-window kwargs shared by every parallel superstep builder
        # (corpus stays on the host; the builder only needs its length for
        # the in-jit cursor advance)
        streamed_kw = (
            dict(length=len(train_data), streamed=True) if streaming else {}
        )
        self.mesh = mesh
        self.parallel = parallel if mesh is not None else None
        self._to_canonical = lambda p: p
        self._from_canonical = lambda p: p
        if mesh is not None and parallel == "dp":
            from ..parallel import dp as dp_mod

            self._shard = lambda s: dp_mod.shard_state(s, mesh, mesh_axis)
            if streaming:
                self.superstep = dp_mod.make_dp_streamed_superstep(
                    mcfg, dcfg, tcfg, len(train_data), mesh, mesh_axis, cell_fn
                )
            else:
                self.superstep = dp_mod.make_dp_superstep(
                    mcfg, dcfg, tcfg, self.corpus, mesh, mesh_axis, cell_fn
                )
        elif mesh is not None and parallel == "tp":
            from ..parallel import tp as tp_mod

            ndev = mesh.devices.size
            axis = mesh.axis_names[0]
            self._to_canonical = lambda p: tp_mod.unpermute_params_from_tp(
                jax.device_get(p), ndev
            )
            self._from_canonical = lambda p: tp_mod.permute_params_for_tp(p, ndev)
            self._shard = lambda s: tp_mod.shard_tp_state(
                dataclasses.replace(
                    s,
                    params=self._from_canonical(s.params),
                    m=self._from_canonical(s.m),
                ),
                mesh,
                mcfg,
                axis,
            )
            tp_backend = _select_tp_backend(mcfg, dcfg.batch, ndev, cell_fn)
            self.superstep = tp_mod.make_tp_superstep(
                mcfg, dcfg, tcfg, self.corpus, mesh, axis, backend=tp_backend,
                **streamed_kw,
            )
        elif mesh is not None and parallel == "dp_tp":
            from ..parallel import dp_tp as dp_tp_mod
            from ..parallel import tp as tp_mod

            n_model = mesh.shape["model"]
            self._to_canonical = lambda p: tp_mod.unpermute_params_from_tp(
                jax.device_get(p), n_model
            )
            self._from_canonical = lambda p: tp_mod.permute_params_for_tp(p, n_model)
            self._shard = lambda s: dp_tp_mod.shard_dp_tp_state(
                dataclasses.replace(
                    s,
                    params=self._from_canonical(s.params),
                    m=self._from_canonical(s.m),
                ),
                mesh,
                mcfg,
            )
            # per-data-shard batch feeds the kernel (MESH-relative DMA
            # addressing makes the seq kernel 2-D-mesh correct); the fused
            # per-step kernel is not in this ladder — it has no 2-D vma
            # plumbing
            dp_tp_backend = _select_tp_backend(
                mcfg, dcfg.batch // mesh.shape["data"], n_model, cell_fn,
                allow_per_step=False,
            )
            self.superstep = dp_tp_mod.make_dp_tp_superstep(
                mcfg, dcfg, tcfg, self.corpus, mesh, backend=dp_tp_backend,
                **streamed_kw,
            )
        elif mesh is not None and parallel == "sp":
            from ..parallel import sp as sp_mod

            axis = mesh.axis_names[0]
            # params stay canonical and replicated; SP shards wall-clock
            # time (window segments across devices), not arrays
            self._shard = lambda s: sp_mod.shard_sp_state(s, mesh, axis)
            self.superstep = sp_mod.make_sp_superstep(
                mcfg, dcfg, tcfg, self.corpus, mesh, axis, cell_fn=cell_fn,
                **streamed_kw,
            )
        elif mesh is not None and parallel == "dp_sp":
            from ..parallel import sp as sp_mod

            self._shard = lambda s: sp_mod.shard_dp_sp_state(s, mesh)
            self.superstep = sp_mod.make_dp_sp_superstep(
                mcfg, dcfg, tcfg, self.corpus, mesh, cell_fn=cell_fn,
                **streamed_kw,
            )
        elif mesh is not None and parallel == "tp_sp":
            from ..parallel import sp as sp_mod
            from ..parallel import tp as tp_mod

            n_model = mesh.shape["model"]
            self._to_canonical = lambda p: tp_mod.unpermute_params_from_tp(
                jax.device_get(p), n_model
            )
            self._from_canonical = lambda p: tp_mod.permute_params_for_tp(
                p, n_model
            )
            self._shard = lambda s: sp_mod.shard_tp_sp_state(
                dataclasses.replace(
                    s,
                    params=self._from_canonical(s.params),
                    m=self._from_canonical(s.m),
                ),
                mesh,
                mcfg,
            )
            self.superstep = sp_mod.make_tp_sp_superstep(
                mcfg, dcfg, tcfg, self.corpus, mesh, **streamed_kw
            )
        elif mesh is not None and parallel == "pp":
            from ..parallel import pp as pp_mod

            axis = mesh.axis_names[0]
            self._to_canonical = lambda p: pp_mod.pp_params_to(
                jax.device_get(p), mcfg
            )
            self._from_canonical = lambda p: pp_mod.pp_params_from(p, mcfg)
            self._shard = lambda s: pp_mod.shard_pp_state(
                dataclasses.replace(
                    s,
                    params=self._from_canonical(s.params),
                    m=self._from_canonical(s.m),
                ),
                mesh,
                axis,
            )
            self.superstep = pp_mod.make_pp_superstep(
                mcfg, dcfg, tcfg, self.corpus, mesh, axis, **streamed_kw
            )
        elif mesh is not None and parallel == "dp_pp":
            from ..parallel import pp as pp_mod

            self._to_canonical = lambda p: pp_mod.pp_params_to(
                jax.device_get(p), mcfg
            )
            self._from_canonical = lambda p: pp_mod.pp_params_from(p, mcfg)
            self._shard = lambda s: pp_mod.shard_dp_pp_state(
                dataclasses.replace(
                    s,
                    params=self._from_canonical(s.params),
                    m=self._from_canonical(s.m),
                ),
                mesh,
            )
            self.superstep = pp_mod.make_dp_pp_superstep(
                mcfg, dcfg, tcfg, self.corpus, mesh, **streamed_kw
            )
        elif mesh is not None:
            raise ValueError(f"unknown parallel mode {parallel!r}")
        elif streaming:
            self._shard = lambda s: s
            self.superstep = make_streamed_superstep(
                mcfg, dcfg, tcfg, len(train_data), cell_fn
            )
        else:
            self._shard = lambda s: s
            self.superstep = make_superstep(mcfg, dcfg, tcfg, self.corpus, cell_fn)
        if streaming:
            from ..data import streaming as streaming_mod

            self.feeder = streaming_mod.WindowFeeder(
                train_data, dcfg, tcfg.superstep
            )
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                # the feeder's (K, S+1, B) batch is sharded on the stream
                # (batch) axis for meshes with a data axis, replicated for
                # model/seq/stage meshes (every device reads the full batch)
                batch_axis = {
                    "dp": mesh_axis, "dp_tp": "data", "dp_sp": "data",
                    "dp_pp": "data",
                }.get(parallel)
                self._windows_sharding = NamedSharding(
                    mesh, PartitionSpec(None, None, batch_axis)
                )
        self.meter = metrics_mod.ThroughputMeter(mcfg)
        self.table = metrics_mod.ResultsTable(results_path)
        self.state = self._shard(self._init_state())
        if self.feeder is not None:
            self.feeder.set_positions(np.asarray(self.state.positions))
        self.last_metrics: Dict[str, float] = {}

    def _init_state(self) -> TrainState:
        key = jax.random.PRNGKey(self.tcfg.seed)
        key, kp, kpos, ks = jax.random.split(key, 4)
        params = model.init_params(self.mcfg, kp)
        m = opt_mod.adagrad_init(params)
        h, c = model.init_state(
            self.mcfg, self.dcfg.batch, self.dcfg.reset_std, ks
        )
        positions = corpus_mod.init_positions(
            kpos, self.dcfg.batch, len(self.train_np), self.dcfg.seq
        )
        return TrainState(
            params, m, h, c, positions, jnp.asarray(0, jnp.int32), key
        )

    @property
    def step(self) -> int:
        return int(self.state.step)

    def canonical_params(self):
        """Params in the canonical [i|o|f|u] layout on the default device —
        what eval, sampling, checkpoints, and gradcheck consume (TP holds a
        permuted, sharded layout internally)."""
        return self._to_canonical(self.state.params)

    def chars_per_superstep(self) -> int:
        # each inner step trains B streams × stride new characters
        return self.dcfg.batch * self.dcfg.effective_stride * self.tcfg.superstep

    def dispatch_superstep(self):
        """One superstep dispatch — the public single-dispatch API used by
        ``run()``, bench.py and scripts/run_configs.py. In streaming mode the
        *next* batch is built and device_put right after the (async)
        dispatch, so the host window assembly and H2D transfer overlap the
        device compute. Note: after a dispatch the host feeder's cursors
        (``self.feeder.positions``) lead ``state.positions`` by the one
        prefetched superstep; call ``feeder.set_positions`` before trusting
        them directly (``restore()`` does)."""
        if self.feeder is None:
            return self.superstep(self.state)
        if self._next_windows is None:
            self._next_windows = jax.device_put(
                self.feeder.next_batch(), self._windows_sharding
            )
        out = self.superstep(self.state, self._next_windows)
        self._next_windows = jax.device_put(
            self.feeder.next_batch(), self._windows_sharding
        )
        return out

    def _current_windows(self):
        """(x, t) at the current cursors — in-jit gather (resident) or host
        build (streaming); used by crosscheck/gradcheck."""
        if self.corpus is not None:
            return corpus_mod.make_windows(
                self.corpus, self.state.positions, self.dcfg.seq
            )
        win = jnp.asarray(
            self.feeder.build(np.asarray(self.state.positions)), jnp.int32
        )
        return win[:-1], win[1:]

    def run(
        self,
        steps: Optional[int] = None,
        on_report: Optional[Callable[[Dict[str, float]], None]] = None,
        quiet: bool = False,
    ) -> Dict[str, float]:
        """Train for ``steps`` inner steps (rounded up to supersteps)."""
        total = steps if steps is not None else self.tcfg.steps
        n_super = max(1, -(-total // self.tcfg.superstep))
        timer = metrics_mod.Timer()
        eval_timer = metrics_mod.Timer()
        chars_done = 0
        gmax_window = None
        for k in range(n_super):
            self.state, metrics = self.dispatch_superstep()
            chars_done += self.chars_per_superstep()
            if "gnorm_max" in metrics:
                # running max across the supersteps since the last progress
                # line, so a single-batch spike can't hide between prints.
                # Accumulated on-device (async dispatch): float()ing here
                # every superstep would sync the host loop with the device
                # and drain the streaming prefetch pipeline.
                g = metrics["gnorm_max"]
                gmax_window = g if gmax_window is None else jnp.maximum(gmax_window, g)
            if (k + 1) % max(1, self.tcfg.log_every // self.tcfg.superstep) == 0 or k == n_super - 1:
                bits = float(metrics["bits_mean"])
                gmax = float("nan") if gmax_window is None else float(gmax_window)
                gmax_window = None
                cps, gflops, mfu = self.meter.rates(chars_done, timer.elapsed())
                self.last_metrics = {
                    "step": float(self.step),
                    "train_bpc": bits,
                    "gnorm_max": gmax,
                    "chars_per_sec": cps,
                    "gflops": gflops,
                    "mfu": mfu,
                }
                if not quiet:
                    # ETA meter (reference BLAS variant, lstm.cc:361-380)
                    eta = timer.elapsed() / (k + 1) * (n_super - k - 1)
                    print(
                        f"step {self.step:>8d}  bpc {bits:6.3f}  "
                        f"gmax {gmax:7.2f}  "
                        f"{cps:,.0f} chars/s  {gflops:,.0f} GF/s  mfu {mfu:5.1%}"
                        f"  eta {eta:,.0f}s",
                        flush=True,
                    )
                if on_report:
                    on_report(self.last_metrics)
            if (
                self.tcfg.crosscheck_every
                and self.cell_fn is not None
                and self.parallel is None
                and (k + 1) % self.tcfg.crosscheck_every == 0
            ):
                self.crosscheck(quiet=quiet)
            if (
                self.tcfg.gradcheck_every
                # runs in EVERY parallel mode: the fp64 shadow checks the
                # canonical (gathered) params through the oracle loss on the
                # host CPU, which is mode-independent; only the fp64
                # live-backend variant is DP-gated (see gradcheck())
                and (k + 1) % self.tcfg.gradcheck_every == 0
            ):
                # the reference's per-epoch mid-training FD oracle
                # (lstm_eigen_class/lstm.cc:114-115,146)
                self.gradcheck(
                    samples_per_tensor=self.tcfg.gradcheck_samples,
                    quiet=quiet, rel_floor=1e-4,
                )
            if (
                self.test_np is not None
                and len(self.test_np) > 1
                and eval_timer.elapsed() >= self.tcfg.eval_every_s
            ):
                if "train_bpc" not in self.last_metrics:
                    self.last_metrics["train_bpc"] = float(metrics["bits_mean"])
                self.report_eval(timer.elapsed(), chars_done, quiet=quiet)
                eval_timer.start()
        return self.last_metrics

    def crosscheck(self, tol: Optional[float] = None, quiet: bool = False):
        """Runtime lockstep cross-validation: loss and gradient global-norm
        of the *current* training point computed by both the Pallas kernel
        path and the XLA-scan path, compared live — the rebuild's analogue of
        the reference running Eigen and CUDA side by side every step and
        diffing tensors (``lstm_eigen_CUDA/lstm.cu:425-496``). Unlike the
        interpret-mode test suite, this sees real Mosaic compilation on TPU.

        Returns a dict with both values and the relative deviations; failures
        (deviation > tol) are counted, not fatal (the reference prints and
        continues, ``cu_matrix.cu:16-18``)."""
        if tol is None:
            tol = 2e-2 if self.mcfg.compute_dtype == "bfloat16" else 1e-3
        x, t = self._current_windows()
        params = self.canonical_params()
        h, c = self.state.h, self.state.c

        if getattr(self, "_crosscheck_key", None) is not self.cell_fn:
            self._crosscheck_key = self.cell_fn
            self._crosscheck_fns = None
        if self._crosscheck_fns is None:
            # compile once per backend; data enters as arguments so repeated
            # checks reuse the executable instead of retracing with the
            # current window baked in as constants (an XLA-scan recompile
            # costs minutes over the tunneled TPU)
            def make(cell_fn):
                def f(p, x, t, h, c):
                    loss = model.loss_fn(p, x, t, h, c, self.mcfg, cell_fn)[0]
                    return loss

                def loss_and_gnorm(p, x, t, h, c):
                    loss, grads = jax.value_and_grad(f)(p, x, t, h, c)
                    return loss, opt_mod.global_norm(grads)

                return jax.jit(loss_and_gnorm)

            self._crosscheck_fns = (make(self.cell_fn), make(None))

        fn_pal, fn_xla = self._crosscheck_fns
        l_pal, g_pal = (float(v) for v in fn_pal(params, x, t, h, c))
        l_xla, g_xla = (float(v) for v in fn_xla(params, x, t, h, c))
        dl = abs(l_pal - l_xla) / max(abs(l_xla), 1e-12)
        dg = abs(g_pal - g_xla) / max(abs(g_xla), 1e-12)
        ok = dl <= tol and dg <= tol
        if not ok:
            self.crosscheck_failures += 1
        if not quiet:
            print(
                f"[crosscheck] step {self.step} loss pallas {l_pal:.6f} "
                f"xla {l_xla:.6f} (Δ{dl:.2e})  gnorm pallas {g_pal:.4f} "
                f"xla {g_xla:.4f} (Δ{dg:.2e})  {'ok' if ok else 'MISMATCH'}",
                flush=True,
            )
        return {
            "loss_pallas": l_pal, "loss_xla": l_xla, "rel_loss": dl,
            "gnorm_pallas": g_pal, "gnorm_xla": g_xla, "rel_gnorm": dg,
            "ok": ok,
        }

    def _best_test_bpc(self) -> float:
        """Best held-out bpc seen by ``ckpt_best.npz`` — seeded from the
        existing file's metadata so a resumed run never clobbers a better
        historical snapshot with a worse post-restart eval."""
        if self._best_bpc is None:
            self._best_bpc = float("inf")
            if self.tcfg.checkpoint_dir:
                path = f"{self.tcfg.checkpoint_dir}/ckpt_best.npz"
                if os.path.exists(path):
                    try:
                        import json as _json

                        with np.load(path) as z:
                            meta = _json.loads(bytes(z["meta/json"]).decode())
                        self._best_bpc = float(meta.get("test_bpc", "inf"))
                    except Exception:
                        pass        # unreadable best file: treat as absent
        return self._best_bpc

    def report_eval(self, wall_s: float, chars_done: int, quiet: bool = False):
        """Timed held-out eval + results row + checkpoint + sample — the
        reference's every-900 s block (``class_CUDA/lstm.cc:188-238``)."""
        test_bpc = eval_mod.evaluate_bpc(
            self.canonical_params(),
            self.test_np,
            self.mcfg,
            max_chars=self.tcfg.eval_chars,
            cell_fn=self.cell_fn,
        )
        cps, gflops, mfu = self.meter.rates(chars_done, wall_s)
        row = metrics_mod.ResultRow(
            idx=len(self.table.rows),
            step=self.step,
            chars_trained=chars_done,
            wall_s=wall_s,
            train_bpc=self.last_metrics.get("train_bpc", float("nan")),
            test_bpc=test_bpc,
            gflops=gflops,
            chars_per_sec=cps,
            mfu=mfu,
        )
        self.table.append(row)
        if not quiet:
            print(
                f"[eval] step {self.step} test bpc {test_bpc:.3f} "
                f"(train {row.train_bpc:.3f})",
                flush=True,
            )
        if self.tcfg.checkpoint_dir:
            self.save(f"{self.tcfg.checkpoint_dir}/ckpt.npz")
            if self.tcfg.keep_snapshots:
                # per-eval snapshot retention for tail weight averaging
                # (scripts/swa.py); the rolling ckpt.npz above stays the
                # resume point
                self.save(
                    f"{self.tcfg.checkpoint_dir}/ckpt_step{self.step}.npz",
                    extra_meta={"test_bpc": float(test_bpc)},
                )
            # retain the best-held-out snapshot separately: ckpt.npz is
            # overwritten every interval, so a late training spike would
            # otherwise destroy the scoreboard artifact (the reference
            # keeps only the rolling save, class_CUDA/lstm.cc:224-228)
            if test_bpc < self._best_test_bpc():
                self._best_bpc = test_bpc
                self.save(f"{self.tcfg.checkpoint_dir}/ckpt_best.npz",
                          extra_meta={"test_bpc": float(test_bpc)})
            if self.tcfg.sample_chars:
                # periodic sample dump, as the reference writes
                # models/*_sample.txt every eval interval
                # (class_CUDA/lstm.cc:230-235)
                text = self.sample(self.tcfg.sample_chars)
                with open(
                    f"{self.tcfg.checkpoint_dir}/sample_step{self.step}.txt", "w"
                ) as f:
                    f.write(text)
        return row

    def sample(self, length: Optional[int] = None, temperature: float = 1.0) -> str:
        self.state = dataclasses.replace(
            self.state, key=jax.random.split(self.state.key)[0]
        )
        return sampler_mod.sample_text(
            self.canonical_params(),
            self.mcfg,
            self.state.key,
            length or self.tcfg.sample_chars,
            temperature=temperature,
        )

    def evaluate(self, max_chars: Optional[int] = None) -> float:
        assert self.test_np is not None, "no test split configured"
        return eval_mod.evaluate_bpc(
            self.canonical_params(),
            self.test_np,
            self.mcfg,
            max_chars=max_chars or self.tcfg.eval_chars,
            cell_fn=self.cell_fn,
        )

    def gradcheck(
        self,
        samples_per_tensor: int = 100,
        quiet: bool = False,
        check_seq: int = 16,
        check_batch: int = 8,
        rel_floor: float = 0.0,
    ) -> bool:
        """Numerical gradient check at the current training point — the
        reference runs this once per epoch mid-training
        (``lstm_eigen_class/lstm.cc:114-115,146``,
        ``class_batch/lstm.cc:323-337``). Uses a small slice of the current
        window (the reference checks one batch, not the full stream set).

        Every reference gradcheck model is ``Eigen::MatrixXd`` — double —
        because central differences at ±1e-5 are pure roundoff below fp64.
        Accordingly:

        * **float64 config** (the class-variant parity mode), single-device
          or DP only: the analytic side is the live training backward
          (``self.cell_fn`` — a custom VJP when a kernel backend is active),
          so a planted bug in a hand-written backward is caught directly.
          Other parallel modes train through a different function (TP's
          permuted kernels, PP's staged ring), so they fall through to the
          shadow branch below — which runs in EVERY mode.
        * **fp32/bf16 config** (production): the check runs on an fp64
          *shadow* — params upcast under scoped x64 and differentiated
          through the XLA oracle path (which includes the hand-written
          embedding VJP, ops/cell.py), pinned to the host CPU backend:
          v5e has no native f64, and the FD loop's ~2*samples sequential
          loss evals would each pay the ~45 ms tunnel roundtrip. This
          polices the model math; the live kernel backward is policed
          against that oracle by ``--crosscheck`` (FD → fp64 oracle →
          kernel closes the chain).

        ``rel_floor``: per-leaf relative FD floor (utils/gradcheck.py).
        0 for the at-init parity oracle; the mid-run cadence passes 1e-4
        (trained models hold entries ~1e8x below the leaf's gradient scale
        whose central differences are pure truncation noise).
        """
        from ..utils import gradcheck as gc

        x, t = self._current_windows()
        s = min(check_seq, int(x.shape[0]))
        b = min(check_batch, int(x.shape[1]))
        x, t = x[:s, :b], t[:s, :b]
        h = self.state.h[..., :b, :]
        c = self.state.c[..., :b, :]
        cparams = self.canonical_params()

        if self.mcfg.param_dtype == "float64" and self.parallel in (None, "dp"):
            def scalar_loss(p):
                return model.loss_fn(p, x, t, h, c, self.mcfg, self.cell_fn)[0]

            results = gc.check_gradients(
                jax.jit(scalar_loss), cparams, jax.grad(scalar_loss)(cparams),
                samples_per_tensor=samples_per_tensor, rel_floor=rel_floor,
            )
        else:
            cfg64 = dataclasses.replace(
                self.mcfg, param_dtype="float64", compute_dtype="float64",
                residual_dtype="float64", dropout=0.0,
            )
            # host arrays first (np.asarray pulls from the accelerator once),
            # then everything — traces, jits, and the FD loop's ~2*samples
            # sequential loss evals — stays on the CPU backend
            host64 = lambda a: np.asarray(a, np.float64)
            p_host = jax.tree_util.tree_map(host64, cparams)
            h_host, c_host = host64(h), host64(c)
            x_host = np.asarray(x, np.int32)
            t_host = np.asarray(t, np.int32)
            with jax.enable_x64(True), jax.default_device(
                jax.local_devices(backend="cpu")[0]
            ):
                p64 = jax.tree_util.tree_map(jnp.asarray, p_host)
                h64, c64 = jnp.asarray(h_host), jnp.asarray(c_host)
                x_ids = jnp.asarray(x_host)
                t_ids = jnp.asarray(t_host)

                def scalar_loss(p):
                    return model.loss_fn(
                        p, x_ids, t_ids, h64, c64, cfg64
                    )[0]

                results = gc.check_gradients(
                    jax.jit(scalar_loss), p64,
                    jax.grad(scalar_loss)(p64),
                    samples_per_tensor=samples_per_tensor,
                    rel_floor=rel_floor,
                )

        ok = all(r.passed for r in results.values())
        if not ok:
            self.gradcheck_failures += 1
        for name, r in results.items():
            status = "ok" if r.passed else "FAIL"
            if not quiet or not r.passed:
                print(
                    f"[gradcheck] step {self.step} {name:30s} "
                    f"max {r.max_rel_err:.2e} mean {r.mean_rel_err:.2e} "
                    f"({r.n_checked} samples) {status}",
                    flush=True,
                )
        return ok

    def save(self, path: str, extra_meta: Optional[Dict] = None):
        ckpt_mod.save_checkpoint(
            path,
            self.canonical_params(),
            self._to_canonical(self.state.m),
            self.step,
            positions=self.state.positions,
            stream_h=self.state.h,
            stream_c=self.state.c,
            rng_key=self.state.key,
            meta={"hidden": self.mcfg.hidden,
                  "num_layers": self.mcfg.num_layers, **(extra_meta or {})},
        )

    def restore(self, path: str):
        params, m, step, extras = ckpt_mod.load_checkpoint(
            path, self.canonical_params(), self._to_canonical(self.state.m)
        )
        self.state = self._shard(
            TrainState(
                params,
                m,
                extras.get("stream_h", self.state.h),
                extras.get("stream_c", self.state.c),
                extras.get("positions", self.state.positions),
                jnp.asarray(step, jnp.int32),
                extras.get("rng_key", self.state.key),
            )
        )
        if self.feeder is not None:
            # re-sync host cursors and drop the stale prefetched batch
            self.feeder.set_positions(np.asarray(self.state.positions))
            self._next_windows = None
