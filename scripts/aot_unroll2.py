#!/usr/bin/env python
"""Deviceless AOT Mosaic compile of the round-4 kernel paths.

The unroll-2 backward (EIGEN_LSTM_BWD_UNROLL=2, ops/pallas_cell.py) and the
tied-embedding substitution feeding the fused-embed kernel are interpret-mode
validated on CPU, but the interpreter accepts constructs Mosaic rejects
(e.g. scalar bitcasts — see _keep_mask's history). This script AOT-compiles
both, at the EXACT shapes the round-4 TPU A/B runs (H=512 B=128 S=100 bf16
compute, bf16 residuals, fused head), against a chipless v5e PJRT topology —
proving the Mosaic lowering AND the unroll-2 VMEM footprint without a TPU.

Run on any host with libtpu installed (no TPU needed):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/aot_unroll2.py
"""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
# chipless libtpu init (see scripts/aot_tp_seq.py)
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-8")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ.setdefault("TPU_WORKER_ID", "0")
os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")
os.environ["EIGEN_LSTM_BWD_UNROLL"] = "2"

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from eigen_lstm_tpu import ModelConfig
    from eigen_lstm_tpu.models import lstm as model
    from eigen_lstm_tpu.ops import pallas_cell as pc
    from eigen_lstm_tpu.ops.dispatch import select_cell_fn

    # real Mosaic lowering, not the interpreter
    pc._use_interpret = lambda: False
    pc._make_fused_seq.cache_clear()
    pc._make_fused_embed_seq.cache_clear()

    topo = topologies.get_topology_desc(topology_name="v5e:2x4", platform="tpu")
    mesh = Mesh(np.asarray(topo.devices[:1]), ("x",))
    repl = NamedSharding(mesh, P())
    print("topology: v5e (deviceless AOT), compiling for 1 chip", flush=True)

    def compile_loss_grad(cfg, tag, expect_unroll2):
        s, b = 100, 128
        params = model.init_params(cfg)
        rng = np.random.default_rng(0)
        ids = np.asarray(rng.integers(0, cfg.vocab, (s, b)), np.int32)
        tg = np.asarray(rng.integers(0, cfg.vocab, (s, b)), np.int32)
        h0, c0 = model.init_state(cfg, b)
        cell_fn = select_cell_fn("pallas", cfg, b, interpret=True)
        assert cell_fn is not None, f"{tag}: pallas gate refused"

        def f(p, ids, tg, h0, c0):
            return jax.value_and_grad(
                lambda q: model.loss_fn(q, ids, tg, h0, c0, cfg, cell_fn)[0]
            )(p)

        def sds(x):
            return jax.ShapeDtypeStruct(
                np.asarray(x).shape, np.asarray(x).dtype, sharding=repl
            )

        abstract = (
            jax.tree_util.tree_map(sds, params),
            sds(ids), sds(tg), sds(h0), sds(c0),
        )
        # the unroll-2 fallback prints a trace-time message — capture stdout
        # so the script can FAIL if the knob silently fell back to unroll-1
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            lowered = jax.jit(f).lower(*abstract)
            compiled = lowered.compile()
        fell_back = "falling back to unroll-1" in buf.getvalue()
        if expect_unroll2 and fell_back:
            print(buf.getvalue(), flush=True)
            raise SystemExit(f"{tag}: unroll-2 fell back — VMEM gate refused "
                             f"the A/B shape")
        txt = compiled.as_text() or ""
        n_ccall = txt.count("tpu_custom_call")
        mem = compiled.memory_analysis()
        extra = ""
        if mem is not None:
            extra = (f", argument+output+temp = "
                     f"{(mem.argument_size_in_bytes + mem.output_size_in_bytes + mem.temp_size_in_bytes) / 1e6:.0f} MB")
        print(f"PASS {tag}: compiled, {n_ccall} tpu_custom_call site(s)"
              f"{extra}", flush=True)

    # 1) the A/B arm: unroll-2 backward at the exact benchmark shape
    compile_loss_grad(
        ModelConfig(hidden=512, num_layers=1, loss_mode="all",
                    compute_dtype="bfloat16", residual_dtype="bfloat16",
                    seed=0),
        "unroll2 H=512 bf16-residual A/B arm", expect_unroll2=True,
    )
    # 2) tied embeddings through the fused-embed kernel (unroll immaterial)
    compile_loss_grad(
        ModelConfig(hidden=512, num_layers=1, loss_mode="all",
                    compute_dtype="bfloat16", residual_dtype="bfloat16",
                    seed=0, tie_embeddings=True),
        "tied-embed H=512 fused kernel", expect_unroll2=False,
    )
    print("ALL PASS", flush=True)


if __name__ == "__main__":
    main()
