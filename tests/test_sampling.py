"""Unit tests for operators/sampling.py (deterministic data mixing)."""

import hashlib

import pyspark.sql.functions as F
import pytest

from duplicate_finder_spark.operators.sampling import (
    stratified_sample, token_budget_sample)


def _df(spark, rows, parts=1):
    df = spark.createDataFrame(rows, "doc_id long, lang string, nt long")
    return df.repartition(parts)


ROWS = [(i, "en" if i % 3 else "de", 10 + i % 7) for i in range(60)]


def _key(i):
    return hashlib.md5(str(i).encode()).hexdigest()


class TestStratified:
    def test_matches_python_reference(self, spark):
        got = stratified_sample(_df(spark, ROWS), "lang", 5).collect()
        by_lang = {}
        for i, lang, _ in ROWS:
            by_lang.setdefault(lang, []).append(i)
        want = set()
        for lang, ids in by_lang.items():
            for rank, i in enumerate(sorted(ids, key=_key)[:5], 1):
                want.add((lang, i, rank))
        assert {(r.lang, r.doc_id, r.rank) for r in got} == want

    def test_partition_invariant(self, spark):
        a = {(r.lang, r.doc_id, r.rank) for r in
             stratified_sample(_df(spark, ROWS, 1), "lang", 7).collect()}
        b = {(r.lang, r.doc_id, r.rank) for r in
             stratified_sample(_df(spark, ROWS, 13), "lang", 7).collect()}
        assert a == b

    def test_small_stratum_returned_whole(self, spark):
        rows = [(1, "xx", 5), (2, "xx", 5), (3, "en", 5)]
        got = stratified_sample(_df(spark, rows), "lang", 10).collect()
        assert len(got) == 3

    def test_rejects_bad_k(self, spark):
        with pytest.raises(ValueError):
            stratified_sample(_df(spark, ROWS), "lang", 0)


class TestTokenBudget:
    def test_matches_python_reference(self, spark):
        budget = 80
        got = token_budget_sample(_df(spark, ROWS), "lang", budget,
                                  F.col("nt")).collect()
        by_lang = {}
        for i, lang, nt in ROWS:
            by_lang.setdefault(lang, []).append((i, nt))
        want = set()
        for lang, docs in by_lang.items():
            cum = 0
            for i, nt in sorted(docs, key=lambda d: _key(d[0])):
                cum += nt
                if cum > budget:
                    break  # hard cap: first overflow ends the stratum
                want.add((lang, i, nt, cum))
        assert {(r.lang, r.doc_id, r.n_tokens, r.cum_tokens)
                for r in got} == want

    def test_budget_is_hard_cap(self, spark):
        got = token_budget_sample(_df(spark, ROWS), "lang", 50,
                                  F.col("nt")).collect()
        assert got and all(r.cum_tokens <= 50 for r in got)

    def test_zero_budget_empty(self, spark):
        assert token_budget_sample(_df(spark, ROWS), "lang", 0,
                                   F.col("nt")).count() == 0

    def test_rejects_negative_budget(self, spark):
        with pytest.raises(ValueError):
            token_budget_sample(_df(spark, ROWS), "lang", -1, F.col("nt"))


class TestSoftDedupWeights:
    def test_weights_are_inverse_multiplicity(self, spark):
        from duplicate_finder_spark.operators.sampling import \
            softdedup_weights
        rows = [(1, "same"), (2, "same"), (3, "same"),
                (4, "unique"), (5, "other"), (6, "other")]
        out = {r.doc_id: r for r in softdedup_weights(
            spark.createDataFrame(rows, "doc_id long, text string"))
            .collect()}
        assert [out[i].dup_count for i in (1, 4, 5)] == [3, 1, 2]
        assert out[1].weight == 0.333333        # round(1/3, 6)
        assert out[4].weight == 1.0
        assert out[5].weight == 0.5
        # mass of each text's copies sums to ~1 doc
        assert abs(sum(out[i].weight for i in (1, 2, 3)) - 1) < 1e-5

    def test_multiplicity_aggregates_before_join(self, spark):
        from duplicate_finder_spark.operators.sampling import \
            softdedup_weights
        df = softdedup_weights(spark.createDataFrame(
            [(1, "t")], "doc_id long, text string"))
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        # partial (map-side) aggregation must bound hot hashes before
        # any exchange
        assert "HashAggregate" in plan and "EvalPython" not in plan
