"""eigen_lstm_tpu — a TPU-native rebuild of krocki/Eigen-LSTM.

Character-level LSTM language modeling on byte corpora, redesigned TPU-first:
JAX/XLA for the compute graph, a fused Pallas cell kernel for the recurrence,
``shard_map`` data parallelism over an ICI mesh, and a native C++ IO runtime.
See SURVEY.md at the repo root for the reference structural analysis.
"""

from .config import DataConfig, MeshConfig, ModelConfig, TrainConfig

__version__ = "0.1.0"

__all__ = [
    "ModelConfig",
    "DataConfig",
    "TrainConfig",
    "MeshConfig",
    "__version__",
]
