"""Ensemble evaluator: probability-space mixture over the same scoring
semantics as ``evaluate_bpc`` (reference ``test()``,
``class_CUDA/lstm.cc:661-720``; the ensemble itself is new capability)."""

import numpy as np
import pytest

from eigen_lstm_tpu import ModelConfig
from eigen_lstm_tpu.models import init_params
from eigen_lstm_tpu.train import evaluator as eval_mod

from test_train import synthetic_corpus


@pytest.fixture(scope="module")
def held_out():
    return synthetic_corpus(4000, seed=3)


def test_ensemble_of_identical_members_matches_single(held_out):
    cfg = ModelConfig(hidden=32, num_layers=1, seed=7)
    params = init_params(cfg)
    single = eval_mod.evaluate_bpc(params, held_out, cfg, max_chars=2000)
    ens = eval_mod.evaluate_ensemble_bpc(
        [(params, cfg, None), (params, cfg, None)], held_out, max_chars=2000
    )
    # mean of identical distributions is the distribution itself
    assert abs(ens - single) < 1e-3


def test_ensemble_mixed_architectures(held_out):
    cfg_a = ModelConfig(hidden=32, num_layers=1, seed=1)
    cfg_b = ModelConfig(hidden=64, num_layers=2, seed=2)
    members = [
        (init_params(cfg_a), cfg_a, None),
        (init_params(cfg_b), cfg_b, None),
    ]
    bpc_a = eval_mod.evaluate_bpc(members[0][0], held_out, cfg_a, max_chars=2000)
    bpc_b = eval_mod.evaluate_bpc(members[1][0], held_out, cfg_b, max_chars=2000)
    ens = eval_mod.evaluate_ensemble_bpc(members, held_out, max_chars=2000)
    assert np.isfinite(ens)
    # -log2(mean_i p_i) <= -log2(p_j / M) for every member j
    assert ens <= min(bpc_a, bpc_b) + np.log2(2) + 1e-6


def test_ensemble_empty_rejected(held_out):
    with pytest.raises(ValueError):
        eval_mod.evaluate_ensemble_bpc([], held_out)
