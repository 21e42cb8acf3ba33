"""Paragraph dedup + Gopher repetition signals (operators/paragraphs.py).

Tiny hand-built corpora with closed-form expected values: chunking
(remainder + blank-text edges), corpus-wide keep-first accounting,
document reconstruction, within-doc repetition, and the top-2-gram
tie-break. A plan test pins the stats path to a text-free dedup shuffle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duplicate_finder_spark.operators.paragraphs import (
    paragraph_dedup_apply, paragraph_dedup_stats, paragraphs,
    repetition_signals)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraphs_chunking_and_remainder(spark):
    df = _docs(spark, [(1, "a b c d e f g"),   # 3+3+1
                       (2, "x y"),             # one short chunk
                       (3, "   "),             # blank → no paragraphs
                       ])
    got = {(r.doc_id, r.para_idx): r.para
           for r in paragraphs(df, w=3).collect()}
    assert got == {(1, 0): "a b c", (1, 1): "d e f", (1, 2): "g",
                   (2, 0): "x y"}


def test_dedup_stats_keep_first_order(spark):
    # "a b c" first occurs at (1,0); its repeats at (1,2), (2,0) are dups.
    df = _docs(spark, [(1, "a b c d e f a b c"),
                       (2, "a b c x y z"),
                       (3, "q r s")])
    rows = {r.doc_id: r for r in
            paragraph_dedup_stats(df, w=3).collect()}
    assert (rows[1].n_paras, rows[1].n_dup_paras) == (3, 1)
    assert (rows[2].n_paras, rows[2].n_dup_paras) == (2, 1)
    assert (rows[3].n_paras, rows[3].n_dup_paras) == (1, 0)
    # doc 2: dup chars 5 ("a b c") of 10 total ("a b c" + "x y z")
    assert rows[2].dup_char_frac == 0.5
    assert rows[3].dup_char_frac == 0.0


def test_dedup_apply_reconstruction_and_vanishing(spark):
    df = _docs(spark, [(1, "a b c d e f"),
                       (2, "a b c d e f"),      # fully duplicate → vanishes
                       (3, "d e f q r s")])     # keeps only its novel tail
    got = {r.doc_id: (r.clean_text, r.n_kept)
           for r in paragraph_dedup_apply(df, w=3).collect()}
    assert got == {1: ("a b c d e f", 2), 3: ("q r s", 1)}


def test_repetition_signals_within_doc(spark):
    # doc 1: windows (w=2) = [a b][a b][c d] → 1 in-doc dup of 3;
    # top 2-gram "a b" occurs 2× overlapping-counted 3 times? no:
    # bigrams = a b, b a, a b, b c, c d → top = "a b" (2 of 5).
    df = _docs(spark, [(1, "a b a b c d"),
                       (2, "x y")])             # single window, no bigram dup
    rows = {r.doc_id: r for r in repetition_signals(df, w=2).collect()}
    r1 = rows[1]
    assert (r1.n_paras, r1.n_dup_paras) == (3, 1)
    assert r1.dup_para_char_frac == pytest.approx(3 / 9)
    assert r1.top_2gram == "a b"
    # 2 occurrences × 3 chars / 11 doc chars
    assert r1.top_2gram_char_frac == pytest.approx(round(6 / 11, 6))
    r2 = rows[2]
    assert (r2.n_paras, r2.n_dup_paras) == (1, 0)
    assert r2.top_2gram == "x y"


def test_top_2gram_tie_breaks_lexicographically(spark):
    # "b a" and "a b" both occur once → smallest gram wins.
    df = _docs(spark, [(1, "b a b")])   # bigrams: "b a", "a b"
    row = repetition_signals(df, w=2).collect()[0]
    assert row.top_2gram == "a b"


def test_stats_shuffle_carries_no_paragraph_text(spark):
    """The corpus-wide dedup window must shuffle (hash, id, idx, chars)
    only — the paragraph string is projected away before the exchange."""
    df = _docs(spark, [(1, "a b c d e f")])
    plan = paragraph_dedup_stats(df, w=3)._jdf.queryExecution() \
        .executedPlan().toString()
    exchange = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert exchange, plan
    dedup_ex = [ln for ln in exchange if "para_hash" in ln]
    assert dedup_ex and all("para#" not in ln and ", para," not in ln
                            for ln in dedup_ex), plan


def test_single_doc_all_unique_zero_fracs(spark):
    df = _docs(spark, [(7, "p q r s t u v w")])
    row = paragraph_dedup_stats(df, w=3).collect()[0]
    assert (row.n_paras, row.n_dup_paras, row.dup_char_frac) == (3, 0, 0.0)
