"""LSH band-parameter tuner (operators/lsh.py, pure math — no Spark)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duplicate_finder_spark.operators.lsh import (lsh_candidate_prob,
                                                  lsh_miss_mass,
                                                  tune_lsh_bands)


def test_s_curve_endpoints_and_monotonicity():
    assert lsh_candidate_prob(0.0, 32, 4) == 0.0
    assert lsh_candidate_prob(1.0, 32, 4) == 1.0
    probs = [lsh_candidate_prob(j / 100, 32, 4) for j in range(101)]
    assert all(a <= b for a, b in zip(probs, probs[1:]))


def test_tuner_reproduces_the_pinned_engine_config():
    """The shipped 32×4 @ threshold 0.8 (q_cc_clusters' oracle-equality
    argument rests on its ~2e-9 miss mass) is what the tuner derives
    from first principles at the default 0.999 floor."""
    assert tune_lsh_bands(0.8, 128) == (32, 4)
    assert lsh_miss_mass(0.8, 32, 4) / 0.2 < 1e-8


def test_floor_relaxation_buys_fewer_candidates():
    """Relaxing the recall floor can only move the choice toward fewer
    bands (a cheaper, lower-recall curve) — here 0.99 admits 16×8."""
    assert tune_lsh_bands(0.8, 128, recall_floor=0.99) == (16, 8)
    assert lsh_miss_mass(0.8, 16, 8) / 0.2 <= 0.01


def test_infeasible_floor_falls_back_to_max_recall():
    b, r = tune_lsh_bands(0.99, 8, recall_floor=1.0 - 1e-12)
    # nothing reaches a 1e-12 miss with 8 perms at 0.99; the fallback
    # must still be the best-recall divisor split
    best = min(((lsh_miss_mass(0.99, bb, 8 // bb) / 0.01, bb)
                for bb in (1, 2, 4, 8)), key=lambda x: x[0])
    assert b == best[1] and b * r == 8


def test_rejects_degenerate_threshold():
    with pytest.raises(ValueError):
        tune_lsh_bands(0.0)
    with pytest.raises(ValueError):
        tune_lsh_bands(1.0)


@settings(max_examples=25, deadline=None)
@given(t=st.floats(0.3, 0.95), num_perm=st.sampled_from([32, 64, 128, 256]))
def test_tuned_pair_is_valid_and_meets_floor_when_feasible(t, num_perm):
    b, r = tune_lsh_bands(t, num_perm)
    assert b * r == num_perm and b >= 1 and r >= 1
    miss = lsh_miss_mass(t, b, r) / (1.0 - t)
    feasible = any(
        lsh_miss_mass(t, bb, num_perm // bb) / (1.0 - t) <= 1e-3
        for bb in range(1, num_perm + 1) if num_perm % bb == 0)
    if feasible:
        assert miss <= 1e-3


def test_config_tuned_reproduces_pinned_flagship():
    from duplicate_finder_spark.config import PipelineConfig
    cfg = PipelineConfig.tuned()
    assert (cfg.lsh_bands, cfg.rows_per_band) == (32, 4)
    assert cfg.jaccard_threshold == 0.8
    # kwargs pass through to the regular constructor
    cfg2 = PipelineConfig.tuned(0.9, 128, sketch_k=256)
    assert cfg2.num_perm % cfg2.lsh_bands == 0
    assert cfg2.sketch_k == 256
