"""Corpus-wide exact duplicated-substring dedup (Lee et al. ExactSubstr).

The reference dedups whole files by content hash (duplicate_finder.py:
group-by-sha256); web-scale training pipelines ALSO need the
sub-document exact pass of Lee et al. 2021 ("Deduplicating Training
Data Makes Language Models Better", §4.1 ExactSubstr): any character
span of length ≥ L that occurs verbatim more than once in the corpus is
a duplicate, and every occurrence after the first is removed. The paper
builds one giant suffix array; the Spark-native equivalent below gets
identical span semantics from anchor grams + islands:

1. **Anchor grams** — every overlapping L-char window of every doc,
   keyed by a 128-bit hash pair, generated map-side (narrow).
2. **Corpus-wide occurrence ranking** — one hash exchange on the gram
   key; a window ranks occurrences in (doc_id, position) order, so
   "first occurrence" is globally deterministic.
3. **Islands** — consecutive flagged positions within a doc coalesce
   into maximal duplicated spans (the union of overlapping duplicated
   L-grams is exactly the set of maximal duplicated substrings of
   length ≥ L that a suffix array would report).
4. **Apply** — a JVM ``aggregate`` fold splices the kept segments back
   together; no Python anywhere in this module.

Scale notes (100 TB):
- The explode emits one row per character position (like the suffix
  array itself, which is O(n) entries); each shuffled row is only
  (doc_id, pos, h1, h2) — ~32 bytes, never text. One exchange total.
- The gram key is the PAIR (xxhash64(g), xxhash64(g, salt)) — 128
  effective bits, same birthday-bound argument as the sha2-keyed
  paragraph dedup (operators/paragraphs.py): ~10^13 anchor positions
  is ~2^43 keys, collision mass ≲ 2^-42. A false merge costs at most
  one wrongly-removed span, never a crash.
- Hashing is O(L) JVM work per position (substring + xxhash64 inside
  whole-stage codegen). L is a small constant (the paper used 50
  tokens); the O(n·L) total is the price the suffix array pays in
  construction instead.
- Span coalescing and text splicing shuffle on doc_id — the same
  skew-free recomposition key as paragraph_dedup_apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["anchor_grams", "exact_substr_spans", "exact_substr_apply"]

_SALT = 0x5EED  # second hash of the 128-bit gram key


def anchor_grams(docs: DataFrame, length: int, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, p, h1, h2): every L-char window, 1-based position, hashed.

    Docs shorter than ``length`` contribute nothing (a fragment shorter
    than the anchor is not evidence of duplication at this threshold).
    """
    if length < 2:
        raise ValueError(f"anchor length must be >= 2, got {length}")
    base = (docs.select(id_col, text_col)
                .filter(F.length(text_col) >= length))
    pos = base.select(
        id_col, text_col,
        F.explode(F.sequence(
            F.lit(1), F.length(text_col) - F.lit(length - 1))).alias("p"))
    g = F.substring(F.col(text_col), F.col("p"), F.lit(length))
    return pos.select(
        id_col, "p",
        F.xxhash64(g).alias("h1"),
        F.xxhash64(g, F.lit(_SALT)).alias("h2"))


def _islands(flagged: DataFrame, length: int, id_col: str) -> DataFrame:
    """Coalesce flagged positions into maximal spans (start, end)."""
    wd = Window.partitionBy(id_col).orderBy("p")
    return (flagged
            .withColumn("_isl", F.col("p") - F.row_number().over(wd))
            .groupBy(id_col, "_isl")
            .agg(F.min("p").alias("span_start"),
                 (F.max("p") + F.lit(length - 1)).alias("_span_end"))
            .drop("_isl"))


def exact_substr_spans(docs: DataFrame, length: int = 30,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """All maximal duplicated spans: (id, span_start, span_len).

    A position is duplicated iff its L-gram occurs ≥ 2 times anywhere
    in the corpus (including elsewhere in the same doc) — every
    occurrence is reported, first ones included. This is the audit
    view; ``exact_substr_apply`` is the keep-first mutation.
    """
    grams = anchor_grams(docs, length, id_col, text_col)
    wk = Window.partitionBy("h1", "h2")
    flagged = (grams.withColumn("_n", F.count("*").over(wk))
                    .filter(F.col("_n") >= 2)
                    .select(id_col, "p"))
    return (_islands(flagged, length, id_col)
            .select(id_col, F.col("span_start").cast("long"),
                    (F.col("_span_end") - F.col("span_start") + 1)
                    .cast("long").alias("span_len")))


def exact_substr_apply(docs: DataFrame, length: int = 30,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Remove every duplicated span after its first occurrence.

    Occurrences of each L-gram are ranked by (doc_id, position); ranks
    ≥ 2 are flagged, flagged positions coalesce into maximal spans, and
    the spans are spliced out of the text (Lee et al. §4.1 semantics —
    the first occurrence, in global corpus order, survives verbatim).
    Returns (id, clean_text) for EVERY input doc; untouched docs pass
    through byte-identical.
    """
    grams = anchor_grams(docs, length, id_col, text_col)
    wk = Window.partitionBy("h1", "h2").orderBy(id_col, "p")
    flagged = (grams.withColumn("_occ", F.row_number().over(wk))
                    .filter(F.col("_occ") >= 2)
                    .select(id_col, "p"))
    spans = (_islands(flagged, length, id_col)
             .groupBy(id_col)
             .agg(F.sort_array(F.collect_list(
                 F.struct(F.col("span_start").alias("s"),
                          F.col("_span_end").alias("e")))).alias("_spans")))

    text = F.col(text_col)
    # fold over the sorted disjoint spans: emit the gap before each
    # span, skip the span, then emit the tail — all JVM, no UDF
    rebuilt = F.aggregate(
        F.col("_spans"),
        F.struct(F.lit("").alias("out"), F.lit(1).cast("int").alias("cur")),
        lambda acc, sp: F.struct(
            F.concat(acc["out"],
                     F.substring(text, acc["cur"],
                                 sp["s"].cast("int") - acc["cur"])
                     ).alias("out"),
            (sp["e"] + 1).cast("int").alias("cur")),
        lambda acc: F.concat(
            acc["out"],
            F.substring(text, acc["cur"],
                        F.length(text) - acc["cur"] + F.lit(1))))
    return (docs.select(id_col, text_col)
            .join(spans, id_col, "left")
            .select(id_col,
                    F.when(F.col("_spans").isNull(), text)
                     .otherwise(rebuilt).alias("clean_text")))
