#!/usr/bin/env python
"""Deviceless AOT Mosaic compile of the tp_seq kernel at D=8 (v5e-8).

The in-kernel-ICI sequence TP kernel (ops/pallas_tp_seq.py) has its remote
DMA code paths compiled only at D > 1, which a 1-chip box cannot execute.
Interpret mode validates the exchange *protocol* (tests/test_tp_seq.py) and
D=1 validates single-shard lowering (scripts/tpu_regression.py); this
script closes the remaining gap (VERDICT r2 missing #3): it AOT-compiles
the FULL TP training superstep — pallas_seq fwd+bwd kernels with their
``make_async_remote_copy`` ICI exchanges, under the default vma-checked
shard_map — against a v5e:2x4 PJRT topology (``jax.experimental.topologies``)
with NO chips attached, proving the D=8 Mosaic lowering end-to-end.

Run on any host with libtpu installed (no TPU needed):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/aot_tp_seq.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force the CPU client: the topology client below carries the TPU target
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
# chipless libtpu init: without these, PJRT topology compile futex-hangs
# trying to resolve worker hostnames from metadata that doesn't exist here
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-8")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ.setdefault("TPU_WORKER_ID", "0")
os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")

import numpy as np


def main(ndev: int = 8, hidden_per_shard: int = 128, batch: int = 128,
         seq: int = 100):
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from eigen_lstm_tpu import DataConfig, ModelConfig, TrainConfig
    from eigen_lstm_tpu.ops import pallas_tp_seq as seq_mod
    from eigen_lstm_tpu.parallel import tp as tp_mod
    from eigen_lstm_tpu.train.trainer import Trainer, TrainState

    # real Mosaic lowering, not the interpreter (the CPU client would
    # otherwise flip tp_seq_lstm into interpret mode)
    seq_mod._use_interpret = lambda: False
    seq_mod._make_tp_seq.cache_clear()

    topo = topologies.get_topology_desc(
        topology_name=f"v5e:{ndev // 4}x4" if ndev % 4 == 0 else f"v5e:1x{ndev}",
        platform="tpu",
    )
    devices = list(topo.devices)
    assert len(devices) == ndev, (len(devices), ndev)
    mesh = Mesh(np.asarray(devices), ("model",))
    print(f"topology: v5e {ndev} devices (deviceless AOT)", flush=True)

    mcfg = ModelConfig(
        hidden=hidden_per_shard * ndev, num_layers=1, loss_mode="all",
        compute_dtype="bfloat16", seed=0,
    )
    dcfg = DataConfig(path="", batch=batch, seq=seq, train_percent=1.0)
    tcfg = TrainConfig(lr=0.02, superstep=10, eval_every_s=1e9)
    assert seq_mod.tp_seq_supported(mcfg, dcfg.batch, ndev), "gate must pass"

    data = np.tile(np.arange(251, dtype=np.uint8), 1000)
    tr = Trainer(mcfg, dcfg, tcfg, data, None)   # CPU init for shapes only
    step = tp_mod.make_tp_superstep(
        mcfg, dcfg, tcfg, tr.corpus, mesh, donate=False,
        backend="pallas_seq", check_vma=True,
    )

    # abstract inputs carrying the TP shardings on the topology mesh
    from jax.sharding import NamedSharding

    pspecs = tp_mod.tp_specs(mcfg, "model")
    from jax.sharding import PartitionSpec as P

    def sds(x, spec):
        return jax.ShapeDtypeStruct(
            np.asarray(x).shape, np.asarray(x).dtype,
            sharding=NamedSharding(mesh, spec),
        )

    state = tr.state
    abstract = TrainState(
        params=jax.tree_util.tree_map(sds, state.params, pspecs),
        m=jax.tree_util.tree_map(sds, state.m, pspecs),
        h=sds(state.h, P(None, None, "model")),
        c=sds(state.c, P(None, None, "model")),
        positions=sds(state.positions, P()),
        step=sds(state.step, P()),
        key=sds(state.key, P()),
    )

    lowered = step.lower(abstract)
    print("lowered: ok (StableHLO for the 8-device mesh)", flush=True)
    compiled = lowered.compile()
    txt = compiled.as_text() or ""
    n_ccall = txt.count("tpu_custom_call")
    mem = compiled.memory_analysis()
    print(
        f"compiled: ok — Mosaic kernels in executable: {n_ccall} "
        f"tpu_custom_call site(s)", flush=True,
    )
    if mem is not None:
        print(
            f"memory: argument {mem.argument_size_in_bytes/1e6:.1f} MB, "
            f"temp {mem.temp_size_in_bytes/1e6:.1f} MB/device", flush=True,
        )
    assert n_ccall >= 2, "expected fwd+bwd pallas kernels in the executable"
    print(f"PASS: tp_seq D={ndev} remote-DMA Mosaic lowering compiles "
          f"(H={mcfg.hidden}, B={batch}, S={seq}, bf16, checked shard_map)",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
