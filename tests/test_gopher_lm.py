"""Gopher Table A1 rules (operators/gopherquality.py) and the hashed
bigram LM scorer (operators/lm.py).

Hand-built docs with closed-form expected values per rule, plus the LM
determinism/degradation contracts: empty model → exactly uniform
micro-nat NLL; per-doc sums invariant under repartitioning; target
docs score below off-distribution docs.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from duplicate_finder_spark.operators.gopherquality import (
    gopher_quality_signals)
from duplicate_finder_spark.operators.lm import fit_bigram_lm, lm_score


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _row(spark, text, **kw):
    out = gopher_quality_signals(_docs(spark, [(1, text)]), **kw)
    return out.collect()[0]


def test_word_count_and_mean_word_len(spark):
    r = _row(spark, "aa bbbb cc dddd", min_words=4)
    assert r.n_words == 4
    assert r.mean_word_len == 3.0     # (2+4+2+4)/4
    assert r.ok_words == 1 and r.ok_mean_word_len == 1
    assert _row(spark, "aa bb cc", min_words=4).ok_words == 0
    # mean word length 2 < 3 fails the band
    assert _row(spark, "aa bb cc dd", min_words=4).ok_mean_word_len == 0


def test_symbol_ratio_counts_hash_and_both_ellipses(spark):
    # 2 hashes + 1 unicode + 1 three-dot ellipsis over 4 words
    r = _row(spark, "ab# cd# ef… gh...", min_words=1)
    assert r.symbol_word_ratio == 1.0
    assert r.ok_symbols == 0
    assert _row(spark, "clean words here", min_words=1).ok_symbols == 1


def test_bullet_and_ellipsis_line_fractions(spark):
    text = "• first bullet\n- second bullet\nplain line\nends with…\n\n"
    r = _row(spark, text, min_words=1)
    # 4 non-blank lines: 2 bullets, 1 ellipsis-terminated
    assert r.bullet_line_frac == 0.5
    assert r.ellipsis_line_frac == 0.25
    assert r.ok_bullets == 1 and r.ok_ellipsis == 1
    hot = "\n".join(["• b%d" % i for i in range(10)])
    assert _row(spark, hot, min_words=1).ok_bullets == 0


def test_alpha_fraction_and_required_stopwords(spark):
    r = _row(spark, "123 456 789 word", min_words=1)
    assert r.alpha_word_frac == 0.25
    assert r.ok_alpha == 0
    r2 = _row(spark, "The cat sat with the dog", min_words=1)
    assert r2.n_required_stopwords == 2   # the, with (distinct, cased)
    assert r2.ok_stopwords == 1
    assert _row(spark, "cat sat mat", min_words=1).ok_stopwords == 0


def test_blank_doc_never_passes(spark):
    r = _row(spark, "   ")
    assert r.n_words == 0
    assert (r.mean_word_len, r.symbol_word_ratio, r.alpha_word_frac) \
        == (0.0, 0.0, 0.0)
    assert r.passes_gopher == 0


def test_passes_is_the_conjunction(spark):
    good = ("the data and the table have rows with keys "
            "of many kinds that be useful ") * 5   # 75 words
    r = _row(spark, good)
    assert r.passes_gopher == 1
    assert all(getattr(r, c) == 1 for c in
               ("ok_words", "ok_mean_word_len", "ok_symbols",
                "ok_bullets", "ok_ellipsis", "ok_alpha", "ok_stopwords"))


# --- LM scorer --------------------------------------------------------------

V = 64


def test_lm_empty_model_is_uniform(spark):
    scored = lm_score(_docs(spark, [(1, "a b c")]),
                      _docs(spark, []), n_buckets=V).collect()[0]
    per = round(1e6 * math.log(V))
    assert scored.n_bigrams == 2
    assert scored.nll_micro == 2 * per
    assert scored.mean_nll_micro == per


def test_lm_seen_bigram_scores_below_unseen(spark):
    target = _docs(spark, [(9, "x y x y x y")])
    docs = _docs(spark, [(1, "x y"), (2, "x q")])
    got = {r.doc_id: r.nll_micro
           for r in lm_score(docs, target, n_buckets=V).collect()}
    # doc 1's bigram is in-model; doc 2 shares only the context word
    assert got[1] < got[2]
    # closed form: C(u('x'))=3 bigram positions, C(b('x y'))=3
    assert got[1] == round(1e6 * (math.log(3 + V) - math.log(3 + 1)))
    assert got[2] == round(1e6 * (math.log(3 + V) - math.log(0 + 1)))


def test_lm_short_docs_emit_nothing(spark):
    out = lm_score(_docs(spark, [(1, "solo"), (2, ""), (3, "a b")]),
                   _docs(spark, [(9, "a b")]), n_buckets=V)
    assert [r.doc_id for r in out.collect()] == [3]


def test_lm_prefit_model_reuse_and_partition_invariance(spark):
    rows = [(i, "w%d w%d w%d w%d" % (i % 3, i % 5, i % 7, i % 2))
            for i in range(40)]
    docs = _docs(spark, rows)
    model = fit_bigram_lm(docs, n_buckets=V)
    a = {(r.doc_id, r.nll_micro, r.mean_nll_micro)
         for r in lm_score(docs, model, n_buckets=V).collect()}
    b = {(r.doc_id, r.nll_micro, r.mean_nll_micro)
         for r in lm_score(docs.repartition(7), model,
                           n_buckets=V).collect()}
    assert a == b and len(a) == 40
