"""Unit tests for operators/contamination.py (decontamination + census)."""

import pyspark.sql.functions as F
import pytest

from duplicate_finder_spark.operators.contamination import (
    contamination_check, ngram_census, ngrams)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _grams_py(text, n):
    t = text.split()
    return [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]


class TestNgrams:
    @pytest.mark.parametrize("n", [1, 2, 3, 5])
    def test_matches_python_reference(self, spark, n):
        texts = ["a b c d e f g", "x y", "one", "a a a a", ""]
        df = _df(spark, [(i, t) for i, t in enumerate(texts)])
        out = (df.select("doc_id", F.split(F.trim("text"), r"\s+")
                         .alias("_toks"))
                 .select("doc_id", ngrams(F.col("_toks"), n).alias("g"))
                 .orderBy("doc_id").collect())
        for row, text in zip(out, texts):
            want = _grams_py(text, n) if text else []
            # blank text splits to [''] under raw split; operator callers
            # use tokens() which maps blank -> []; here only check non-blank
            if text:
                assert row.g == want, (text, n)

    def test_short_doc_empty(self, spark):
        df = _df(spark, [(0, "only two")])
        out = (df.select(F.split("text", " ").alias("_toks"))
                 .select(ngrams(F.col("_toks"), 3).alias("g")).first())
        assert out.g == []

    def test_n_validation(self):
        with pytest.raises(ValueError):
            ngrams(F.col("x"), 0)


class TestContamination:
    def test_planted_overlap(self, spark):
        train = _df(spark, [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "entirely unrelated training content here today"),
        ])
        ev = _df(spark, [
            (100, "quick brown fox jumps"),     # all 2 of its 3-grams hit
            (101, "never seen anywhere at all"),  # 0 of 3
            (102, "xx"),                          # too short for n=3
        ])
        rows = {r.doc_id: r for r in
                contamination_check(train, ev, n=3).collect()}
        assert rows[100].n_grams == 2 and rows[100].n_hit == 2
        assert rows[100].contamination_frac == 1.0
        assert rows[101].n_grams == 3 and rows[101].n_hit == 0
        assert rows[101].contamination_frac == 0.0
        assert rows[102].n_grams == 0 and rows[102].n_hit == 0
        assert rows[102].contamination_frac == 0.0

    def test_within_doc_repeat_counts_once(self, spark):
        # eval doc repeats the same 2-gram; distinct-per-doc semantics
        train = _df(spark, [(1, "p q")])
        ev = _df(spark, [(9, "p q r p q")])
        r = contamination_check(train, ev, n=2).first()
        # distinct grams: 'p q', 'q r', 'r p' -> 3; only 'p q' hits
        assert r.n_grams == 3 and r.n_hit == 1

    def test_broadcast_plan_no_python(self, spark):
        train = _df(spark, [(1, "a b c")])
        ev = _df(spark, [(2, "a b")])
        plan = contamination_check(train, ev, n=2)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestCensus:
    def test_histogram(self, spark):
        docs = _df(spark, [
            (1, "a b c"),        # grams: 'a b', 'b c'
            (2, "a b x"),        # 'a b', 'b x'
            (3, "a b c"),        # 'a b', 'b c'
            (4, "z z a b"),      # 'z z', 'z a', 'a b'
        ])
        out = {r.n_docs: r.n_grams for r in
               ngram_census(docs, n=2).collect()}
        # 'a b' in 4 docs, 'b c' in 2 docs; singletons excluded
        assert out == {4: 1, 2: 1}

    def test_all_unique_empty(self, spark):
        docs = _df(spark, [(1, "a b"), (2, "c d")])
        assert ngram_census(docs, n=2).count() == 0
