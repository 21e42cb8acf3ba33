"""Score-aware survivor selection (operators/decisions.keep_best)."""

from __future__ import annotations

from duplicate_finder_spark.operators.decisions import keep_best


def _members(spark, rows):
    return spark.createDataFrame(
        rows, "cluster_id long, url string, score long")


def test_keeps_highest_score_not_first_id(spark):
    df = _members(spark, [(1, "a", 10), (1, "b", 30), (1, "c", 20),
                          (2, "d", 5)])
    out = {r["url"]: r["action"]
           for r in keep_best(df, "score").collect()}
    assert out == {"a": "delete", "b": "keep", "c": "delete",
                   "d": "keep"}


def test_lower_is_better_and_id_tiebreak(spark):
    df = _members(spark, [(1, "b", 7), (1, "a", 7), (1, "c", 9)])
    rows = {r["url"]: r for r in
            keep_best(df, "score", higher_is_better=False).collect()}
    # both a and b score 7 — the smaller id wins the tie
    assert rows["a"]["action"] == "keep"
    assert rows["b"]["action"] == "delete"
    assert rows["c"]["action"] == "delete"
    assert rows["a"]["reason"] == "best score in cluster"
    assert rows["c"]["reason"] == "outscored on score"


def test_single_window_exchange(spark):
    """Scale claim: one hash exchange on cluster_id, nothing else."""
    from tests.test_plans import _plan
    df = _members(spark, [(1, "a", 1), (1, "b", 2)])
    plan = _plan(keep_best(df, "score"), "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "EvalPython" not in plan and "InPandas" not in plan
