"""Finite-difference gradient checking — the reference's core oracle.

Reproduces the reference methodology as a real test utility:
* central difference with ±1e-5 perturbation, 2 full forward-loss passes per
  sampled entry (``class_CUDA/lstm.h:223-264``);
* sampled entries per tensor (~100) for large models
  (``class_batch/lstm.h:203-245``) or exhaustive for small ones
  (``lstm_eigen_class/lstm.h:131-156``);
* relative error ``|a - n| / (|a| + |n|)`` with pass thresholds
  max ≤ 1e-1 and mean ≤ 1e-3 (``lstm_eigen_class/lstm.cc:250-304``).

Run in float64 on CPU (tests enable jax_enable_x64) so the finite-difference
noise floor sits well below the thresholds.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GradCheckResult(NamedTuple):
    max_rel_err: float
    mean_rel_err: float
    n_checked: int

    @property
    def passed(self) -> bool:
        # thresholds from lstm_eigen_class/lstm.cc:250-304
        return self.max_rel_err <= 1e-1 and self.mean_rel_err <= 1e-3


def check_gradients(
    loss_of_params: Callable[[object], jax.Array],
    params,
    analytic_grads,
    samples_per_tensor: int = 100,
    delta: float = 1e-5,
    seed: int = 0,
    floor: float = 0.0,
    rel_floor: float = 0.0,
) -> Dict[str, GradCheckResult]:
    """Compare ``analytic_grads`` (same pytree as ``params``) against central
    differences of ``loss_of_params``. Samples up to ``samples_per_tensor``
    entries per leaf (exhaustive when the leaf is smaller). Returns a result
    per leaf keyed by its tree path.

    ``floor``: entries where ``|analytic| + |numeric| < floor`` count as zero
    relative error — deep stacks produce vanishing layer-0 gradients whose
    relative error is pure finite-difference noise (the reference never
    gradchecks >1-layer models, so this guard is new).

    ``rel_floor``: like ``floor`` but per-leaf relative — the effective floor
    is ``max(floor, rel_floor * max|analytic_leaf|)``. Mid-training models
    hold entries ~1e8x smaller than the leaf's gradient scale where central
    differences are pure truncation noise; such entries are irrelevant to
    the update and are excluded (used by ``Trainer.gradcheck`` on the
    ``--gradcheck-every`` cadence)."""
    rng = np.random.default_rng(seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    grads_flat = jax.tree_util.tree_leaves(analytic_grads)
    assert len(flat) == len(grads_flat)

    base_leaves = [leaf for _, leaf in flat]
    results: Dict[str, GradCheckResult] = {}
    for leaf_i, ((path, leaf), g) in enumerate(zip(flat, grads_flat)):
        name = jax.tree_util.keystr(path)
        leaf_np = np.asarray(leaf, dtype=np.float64)
        g_np = np.asarray(g, dtype=np.float64)
        size = leaf_np.size
        if size <= samples_per_tensor:
            idxs = np.arange(size)
        else:
            idxs = rng.choice(size, size=samples_per_tensor, replace=False)

        leaf_floor = max(floor, rel_floor * float(np.abs(g_np).max()))

        def loss_at(idx, v):
            perturbed = leaf_np.copy()
            perturbed.flat[idx] = v
            leaves = list(base_leaves)
            leaves[leaf_i] = jnp.asarray(perturbed, leaf.dtype)
            return float(loss_of_params(jax.tree_util.tree_unflatten(treedef, leaves)))

        rel_errs = []
        for idx in idxs:
            orig = leaf_np.flat[idx]
            lp = loss_at(idx, orig + delta)
            lm = loss_at(idx, orig - delta)
            numeric = (lp - lm) / (2.0 * delta)
            analytic = g_np.flat[idx]
            denom = abs(analytic) + abs(numeric)
            rel = 0.0 if denom <= leaf_floor else abs(analytic - numeric) / denom
            rel_errs.append(rel)

        rel_errs = np.asarray(rel_errs)
        results[name] = GradCheckResult(
            float(rel_errs.max()), float(rel_errs.mean()), len(idxs)
        )
    return results
