"""Set-operation operators (SURVEY.md §2.7).

The reference has no set operations — its closest pattern is the
exclude-after-include glob precedence (duplicate_finder.py:151-164),
an EXCEPT over path sets. Here the same algebra is exercised on data a
training corpus actually needs compared: per-source token vocabularies
(which sources share vocabulary, which tokens are unique to one).

Scale notes: both sides reduce to DISTINCT token sets BEFORE the set op
(map-side partial dedup), so the shuffle carries vocabularies, not
corpora. INTERSECT/EXCEPT plan as hash joins on the token — Catalyst
picks broadcast when one vocabulary is small; skew is impossible after
dedup (keys are unique per side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duplicate_finder_spark.functions.text import tokens


def source_vocab(docs: DataFrame, source: str,
                 source_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """→ (token) distinct tokens of one source's documents."""
    return (docs.filter(F.col(source_col) == source)
            .select(F.explode(tokens(text_col)).alias("token"))
            .distinct())


def vocab_overlap(docs: DataFrame, source_a: str, source_b: str,
                  source_col: str = "source",
                  text_col: str = "text") -> DataFrame:
    """→ (op, token): 'intersect' = tokens in both sources' vocabularies,
    'except_a' = tokens only in ``source_a``'s — one DataFrame so the
    whole comparison is a single declared plan (Catalyst reuses the two
    vocabulary subtrees across both branches)."""
    va = source_vocab(docs, source_a, source_col, text_col)
    vb = source_vocab(docs, source_b, source_col, text_col)
    both = va.intersect(vb).select(F.lit("intersect").alias("op"), "token")
    only_a = va.exceptAll(vb).select(F.lit("except_a").alias("op"), "token")
    return both.unionByName(only_a)
