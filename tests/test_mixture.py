"""Temperature mixture weighting (operators/mixture.py)."""

from __future__ import annotations

import math

import pytest

from duplicate_finder_spark.operators.mixture import mixture_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")


def test_natural_sampling_alpha_one(spark):
    docs = _docs(spark, [(1, "web", "a b c d"), (2, "web", "e f"),
                         (3, "books", "g h")])
    out = {r["source"]: r for r in
           mixture_weights(docs, alpha=1.0, budget_tokens=80).collect()}
    assert out["web"]["n_docs"] == 2 and out["web"]["n_tokens"] == 6
    assert out["web"]["nat_share"] == 0.75
    # α=1 → mix_weight == nat_share, budget splits naturally
    assert out["web"]["mix_weight"] == 0.75
    assert out["web"]["budget_tokens"] == 60
    assert out["books"]["budget_tokens"] == 20
    assert out["books"]["epochs"] == 10.0  # 20 budget / 2 tokens


def test_low_alpha_flattens_toward_small_sources(spark):
    docs = _docs(
        spark,
        [(i, "web", "w1 w2 w3 w4 w5 w6 w7 w8") for i in range(8)] +
        [(100, "books", "b1 b2")])
    out = {r["source"]: r for r in
           mixture_weights(docs, alpha=0.5, budget_tokens=100).collect()}
    # hand math: web 64 tokens, books 2; sqrt: 8 vs 1.41421356
    tot = math.sqrt(64) + math.sqrt(2)
    assert out["web"]["mix_weight"] == round(8 / tot, 6)
    assert out["books"]["mix_weight"] == round(math.sqrt(2) / tot, 6)
    # flattening: books' mix weight far exceeds its natural share
    assert out["books"]["mix_weight"] > out["books"]["nat_share"] * 4
    assert out["web"]["mix_weight"] < out["web"]["nat_share"]


def test_zero_token_source_gets_zero_weight(spark):
    docs = _docs(spark, [(1, "web", "a b"), (2, "empty", "  ")])
    out = {r["source"]: r for r in
           mixture_weights(docs, alpha=0.7, budget_tokens=10).collect()}
    assert out["empty"]["n_tokens"] == 0
    assert out["empty"]["mix_weight"] == 0.0
    assert out["empty"]["budget_tokens"] == 0
    assert out["empty"]["epochs"] == 0.0
    assert out["web"]["mix_weight"] == 1.0


def test_parameter_validation(spark):
    docs = _docs(spark, [(1, "web", "a")])
    with pytest.raises(ValueError):
        mixture_weights(docs, alpha=0.0, budget_tokens=10)
    with pytest.raises(ValueError):
        mixture_weights(docs, alpha=1.5, budget_tokens=10)
    with pytest.raises(ValueError):
        mixture_weights(docs, alpha=1.0, budget_tokens=0)


def test_plan_is_one_combinable_exchange_no_python(spark):
    """The corpus-sized stage is ONE hash exchange with a partial agg
    below it; the normalizers join back via broadcast; no Python."""
    docs = _docs(spark, [(i, f"s{i % 3}", "a b c") for i in range(30)])
    out = mixture_weights(docs, alpha=0.8, budget_tokens=1000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning(source") <= 2, plan
    assert "partial_count" in plan or "partial_sum" in plan
