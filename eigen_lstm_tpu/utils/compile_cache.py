"""Persistent XLA compilation cache.

Large jitted training graphs take minutes to compile on a tunneled TPU;
caching compiled executables on disk makes re-runs (bench, resumed training,
CLI invocations with identical configs) start in seconds.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``<repo>/.jax_cache``). Safe to call multiple times."""
    import jax

    if path is None:
        path = os.environ.get(
            "EIGEN_LSTM_TPU_CACHE",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                ".jax_cache",
            ),
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even moderately sized programs; the tunnel makes every compile slow
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
