"""Pair recall/precision audit (operators/audit.pair_recall_audit)."""

from __future__ import annotations

import pytest

from duplicate_finder_spark.operators.audit import pair_recall_audit


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "url_a string, url_b string")


def test_exact_match_is_recall_and_precision_one(spark):
    truth = _pairs(spark, [("a", "b"), ("c", "d")])
    out = pair_recall_audit(truth, truth).collect()[0]
    assert (out["n_truth"], out["n_detected"], out["n_hit"]) == (2, 2, 2)
    assert out["recall"] == 1.0 and out["precision"] == 1.0


def test_canonicalization_order_dups_and_self_pairs(spark):
    # detected repeats pairs, reverses order, and emits a self-pair —
    # all collapse to the canonical distinct set {ab}
    detected = _pairs(spark, [("b", "a"), ("a", "b"), ("a", "a")])
    truth = _pairs(spark, [("a", "b"), ("c", "d")])
    out = pair_recall_audit(detected, truth).collect()[0]
    assert (out["n_truth"], out["n_detected"], out["n_hit"]) == (2, 1, 1)
    assert out["recall"] == pytest.approx(0.5)
    assert out["precision"] == pytest.approx(1.0)


def test_false_positives_cut_precision_not_recall(spark):
    detected = _pairs(spark, [("a", "b"), ("c", "d"), ("e", "f"),
                              ("g", "h")])
    truth = _pairs(spark, [("a", "b"), ("c", "d")])
    out = pair_recall_audit(detected, truth).collect()[0]
    assert out["recall"] == pytest.approx(1.0)
    assert out["precision"] == pytest.approx(0.5)


def test_strata_breakdown_and_overall_rollup(spark):
    truth = spark.createDataFrame(
        [("a", "b", "exact"), ("c", "d", "exact"),
         ("e", "f", "near"), ("g", "h", "near")],
        "url_a string, url_b string, dup_type string")
    # catches both exact pairs, one of two near pairs, plus one FP
    detected = _pairs(spark, [("a", "b"), ("c", "d"), ("e", "f"),
                              ("x", "y")])
    rows = {r["stratum"]: r for r in
            pair_recall_audit(detected, truth,
                              strata_col="dup_type").collect()}
    assert rows["exact"]["recall"] == pytest.approx(1.0)
    assert rows["near"]["recall"] == pytest.approx(0.5)
    # precision is corpus-wide only: NULL per stratum, real on rollup
    assert rows["exact"]["precision"] is None
    over = rows["_overall"]
    assert (over["n_truth"], over["n_detected"], over["n_hit"]) == (4, 4, 3)
    assert over["recall"] == pytest.approx(0.75)
    assert over["precision"] == pytest.approx(0.75)


def test_strata_duplicate_truth_rows_counted_once(spark):
    # the same truth pair listed twice (even under two labels) counts
    # once, under the min label — truth is a SET of pairs
    truth = spark.createDataFrame(
        [("a", "b", "near"), ("b", "a", "exact")],
        "url_a string, url_b string, dup_type string")
    detected = _pairs(spark, [("a", "b")])
    rows = {r["stratum"]: r for r in
            pair_recall_audit(detected, truth,
                              strata_col="dup_type").collect()}
    assert set(rows) == {"exact", "_overall"}
    assert rows["_overall"]["n_truth"] == 1
    assert rows["_overall"]["recall"] == pytest.approx(1.0)
