"""Checkpoint / resume.

Reference: ``Parameters::save_to_disk/load_from_disk`` writes one *text* file
per tensor with a name prefix (``class_CUDA/lstm.h:83-101``, ``io.h:16-81``),
loaded at startup (``class_CUDA/lstm.cc:154``) and saved every eval interval
(``:225-227``). The reference does NOT checkpoint the Adagrad accumulator —
resume silently resets it (SURVEY.md §5); the rebuild checkpoints the full
training state: params, optimizer state, stream state (h, c), data cursors,
step counter, and RNG key.

Format: a single ``.npz`` with path-keyed arrays + a JSON metadata entry.
Interop with the reference's text format lives in ``utils/ref_io.py``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any


def _flatten(tree: PyTree, prefix: str) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        prefix + jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat
    }


def _unflatten_like(tree: PyTree, prefix: str, arrays: Dict[str, np.ndarray]) -> PyTree:
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    for path, leaf in flat:
        key = prefix + jax.tree_util.keystr(path)
        if key not in arrays:
            raise KeyError(f"checkpoint missing tensor {key}")
        arr = arrays[key]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"checkpoint shape mismatch for {key}: {arr.shape} vs {leaf.shape}"
            )
        leaves.append(jnp.asarray(arr, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(
    path: str,
    params: PyTree,
    opt_state: PyTree,
    step: int,
    positions: Optional[jax.Array] = None,
    stream_h: Optional[jax.Array] = None,
    stream_c: Optional[jax.Array] = None,
    rng_key: Optional[jax.Array] = None,
    meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Atomic save (write tmp + rename) of the full training state."""
    payload: Dict[str, np.ndarray] = {}
    payload.update(_flatten(params, "params"))
    payload.update(_flatten(opt_state, "opt"))
    if positions is not None:
        payload["data/positions"] = np.asarray(positions)
    if stream_h is not None:
        payload["data/stream_h"] = np.asarray(stream_h)
    if stream_c is not None:
        payload["data/stream_c"] = np.asarray(stream_c)
    if rng_key is not None:
        if jnp.issubdtype(rng_key.dtype, jax.dtypes.prng_key):
            payload["data/rng_key"] = np.asarray(jax.random.key_data(rng_key))
            payload["data/rng_key_typed"] = np.asarray(1)
        else:
            payload["data/rng_key"] = np.asarray(rng_key)
    payload["meta/json"] = np.frombuffer(
        json.dumps({"step": int(step), **(meta or {})}).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        # uncompressed: float parameters are near-incompressible (measured
        # 181.5 -> 168.7 MB for 4x the write time on the 40M-param flagship
        # state), and the save stalls the training loop at every timed eval
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_params(path: str, params_like: PyTree) -> PyTree:
    """Restore only the parameter tensors from a checkpoint (roughly half
    of a full training state — optimizer/stream state is skipped). The
    public loading path for post-processing tools (scripts/ensemble_eval.py,
    scripts/swa.py) that score or average snapshots."""
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files if k.startswith("params")}
    return _unflatten_like(params_like, "params", arrays)


def load_checkpoint(
    path: str, params_like: PyTree, opt_like: PyTree
) -> Tuple[PyTree, PyTree, int, Dict[str, Any]]:
    """Restore (params, opt_state, step, extras). ``extras`` carries
    positions / stream state / rng key / metadata when present."""
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    params = _unflatten_like(params_like, "params", arrays)
    opt_state = _unflatten_like(opt_like, "opt", arrays)
    meta = json.loads(bytes(arrays["meta/json"]).decode())
    extras: Dict[str, Any] = {"meta": meta}
    for name in ("positions", "stream_h", "stream_c"):
        k = f"data/{name}"
        if k in arrays:
            extras[name] = jnp.asarray(arrays[k])
    if "data/rng_key" in arrays:
        raw = arrays["data/rng_key"]
        if "data/rng_key_typed" in arrays:
            extras["rng_key"] = jax.random.wrap_key_data(jnp.asarray(raw))
        else:
            extras["rng_key"] = jnp.asarray(raw)
    return params, opt_state, int(meta["step"]), extras
