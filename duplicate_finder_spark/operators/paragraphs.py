"""Paragraph-level dedup + repetition signals (CCNet / Gopher style).

Generalizes the reference's whole-file hash dedup (duplicate_finder.py:
group-by-sha256) down to the sub-document unit web-scale training-data
pipelines dedup at: CCNet (Wenzek et al., 2020) removes duplicated
paragraphs by hashing normalized paragraphs corpus-wide; Gopher (Rae et
al., 2021, Table A1) filters documents on within-document repetition
signals (duplicate-line fraction, duplicate-line character fraction,
top-n-gram character fraction). Everything here is JVM built-ins — no
Python UDFs — so plans stay in whole-stage codegen and the DuckDB oracle
verifies value-for-value.

The corpus has no newline structure, so "paragraph" is a fixed-width
non-overlapping window of ``w`` whitespace tokens (the last window may be
shorter). Real webtext would split on ``\\n`` instead — only the
``paragraphs()`` splitter changes; dedup/signal semantics are identical.

Scale notes (100 TB):
- ``paragraphs()`` is a narrow generator (posexplode) — zero shuffle.
  The token array is materialized in its own projection first so the
  chunking lambda captures a bound attribute, not the ``split()``
  expression tree (re-inlining the split into the lambda re-evaluates it
  per chunk — the O(n²/w) trap documented at functions/text.py:40).
- Corpus-wide keep-first shuffles ONCE, on sha2(para) — CCNet's design:
  the shuffle rows for the stats path carry only (hash, doc_id,
  para_idx, n_chars), never the paragraph text. sha2-256 (not a 64-bit
  hash) because a 100 TB corpus holds ~10^12 paragraphs — far past the
  64-bit birthday bound.
- Recomposition groups by doc_id — a second narrow shuffle on a
  high-cardinality, skew-free synthetic key.
- Within-doc signals (``repetition_signals``) shuffle on (doc_id, gram)
  then doc_id; partial aggregation (map-side combine) collapses repeats
  before the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from duplicate_finder_spark.functions.text import tokens

__all__ = [
    "paragraphs",
    "paragraph_dedup_stats",
    "paragraph_dedup_apply",
    "repetition_signals",
]


def _chunks(toks: Column, w: int) -> Column:
    """Non-overlapping ``w``-token windows of a token-array column.

    ``toks`` MUST be a bound attribute (select the array into its own
    column first), not an expression — see the module scale note.
    """
    n = F.size(toks)
    n_paras = F.ceil(n / F.lit(w)).cast("int")
    return (F.when(n == 0, F.array().cast("array<string>"))
             .otherwise(F.transform(
                 F.sequence(F.lit(0), n_paras - 1),
                 lambda i: F.concat_ws(" ", F.slice(toks, i * w + 1, w)))))


def paragraphs(docs: DataFrame, w: int = 3, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Explode docs into (id, para_idx, para) — narrow, shuffle-free."""
    t = docs.select(id_col, tokens(text_col).alias("_toks"))
    return (t.select(id_col,
                     F.posexplode(_chunks(F.col("_toks"), w))
                      .alias("para_idx", "para"))
             .withColumn("para_idx", F.col("para_idx").cast("int")))


def _flag_occurrences(paras: DataFrame, id_col: str,
                      within_doc: bool) -> DataFrame:
    """Number identical paragraphs 1..k in (id, para_idx) order.

    occ > 1 marks a duplicate occurrence (keep-first). Corpus-wide mode
    partitions by sha2(para) alone; within-doc mode by (id, hash). The
    paragraph text is dropped BEFORE the window shuffle.
    """
    hashed = paras.select(
        id_col, "para_idx",
        F.sha2(F.col("para"), 256).alias("para_hash"),
        F.length("para").alias("n_chars"))
    if within_doc:
        # partition the (text-free) hashed rows by id ONLY: the window's
        # (id, para_hash) clustering is satisfied by HashPartitioning(id)
        # — a skew-free high-cardinality key — and every downstream
        # per-doc aggregation and join then reuses the same exchange
        # instead of adding its own (see repetition_signals).
        hashed = hashed.repartition(id_col)
    keys = [id_col, "para_hash"] if within_doc else ["para_hash"]
    win = Window.partitionBy(*keys).orderBy(id_col, "para_idx")
    return hashed.withColumn("occ", F.row_number().over(win))


def paragraph_dedup_stats(docs: DataFrame, w: int = 3,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Per-doc corpus-wide paragraph-dedup stats (CCNet accounting).

    Returns (id, n_paras, n_dup_paras, dup_char_frac): how many of the
    doc's paragraphs already occurred earlier in the corpus (keep-first
    over (doc_id, para_idx) order) and the character mass they carry.
    """
    flagged = _flag_occurrences(paragraphs(docs, w, id_col, text_col),
                                id_col, within_doc=False)
    dup = F.col("occ") > 1
    return (flagged.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_paras"),
                 F.sum(dup.cast("int")).cast("long").alias("n_dup_paras"),
                 F.round(F.sum(F.when(dup, F.col("n_chars")).otherwise(0))
                         / F.sum("n_chars"), 6).alias("dup_char_frac")))


def paragraph_dedup_apply(docs: DataFrame, w: int = 3,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Rewrite each doc keeping only first-occurrence paragraphs.

    Docs whose every paragraph is a duplicate disappear (CCNet drops
    them). Unlike the stats path this must carry the paragraph text
    through the dedup shuffle — the price of reconstruction.
    """
    paras = paragraphs(docs, w, id_col, text_col)
    win = Window.partitionBy(F.sha2(F.col("para"), 256)) \
                .orderBy(id_col, "para_idx")
    kept = (paras.withColumn("occ", F.row_number().over(win))
                 .filter(F.col("occ") == 1))
    return (kept.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("para_idx", "para"))),
                         lambda x: x["para"]), " ").alias("clean_text"),
                 F.count("*").cast("long").alias("n_kept")))


def _bigrams(toks: Column) -> Column:
    """Overlapping word 2-grams, linear-time: zip the token array with
    its shifted self (both slices evaluate once per row — no lambda
    capture of the split expression)."""
    n = F.size(toks)
    grams = F.zip_with(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
                       lambda a, b: F.concat_ws(" ", a, b))
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(grams)


def repetition_signals(docs: DataFrame, w: int = 2, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals.

    Returns per doc:
      n_paras             — w-token windows in the doc
      n_dup_paras         — windows identical to an earlier window of
                            the SAME doc (keep-first within doc)
      dup_para_char_frac  — character mass of those duplicate windows
      top_2gram           — most frequent word 2-gram (ties: smallest)
      top_2gram_char_frac — chars covered by its occurrences / doc chars

    Gopher filters docs above thresholds on exactly these signals (Rae
    et al. 2021, Table A1 — "duplicate line fraction", "top-2-gram
    character fraction"); here they're emitted as columns so the
    pipeline can gate on any threshold.
    """
    # every aggregation in BOTH branches is keyed by the doc id (alone
    # or with finer keys), so ONE explicit hash repartition per branch
    # establishes a partitioning that the within-doc window, both gram
    # aggregations, AND the final join all satisfy without further
    # exchanges (HashPartitioning(id) clusters every (id, …) key).
    # Before: window exchange on (id, para_hash) + groupBy(id) exchange
    # + gcnt exchange on (id, chars, gram) + gtop exchange on
    # (id, chars) + join exchanges — 5-6 exchanges; now 2. The id is a
    # skew-free high-cardinality key (module scale note), and the rows
    # repartitioned are the same narrow rows those exchanges carried.
    flagged = _flag_occurrences(paragraphs(docs, w, id_col, text_col),
                                id_col, within_doc=True)
    dup = F.col("occ") > 1
    pstats = (flagged.groupBy(id_col)
              .agg(F.count("*").cast("long").alias("n_paras"),
                   F.sum(dup.cast("int")).cast("long").alias("n_dup_paras"),
                   F.round(F.sum(F.when(dup, F.col("n_chars")).otherwise(0))
                           / F.sum("n_chars"), 6)
                    .alias("dup_para_char_frac")))

    t = docs.select(id_col, F.length(text_col).alias("_doc_chars"),
                    tokens(text_col).alias("_toks"))
    grams = t.select(id_col, "_doc_chars",
                     F.explode(_bigrams(F.col("_toks"))).alias("gram")) \
             .repartition(id_col)
    gcnt = (grams.groupBy(id_col, "_doc_chars", "gram")
                 .agg(F.count("*").cast("long").alias("cnt")))
    # max count, ties broken by smallest gram: min over (-cnt, gram)
    gtop = (gcnt.groupBy(id_col, "_doc_chars")
            .agg(F.min(F.struct((-F.col("cnt")).alias("neg"),
                                F.col("gram"))).alias("_top"))
            .select(id_col,
                    F.col("_top.gram").alias("top_2gram"),
                    F.round((-F.col("_top.neg"))
                            * F.length("_top.gram")
                            / F.col("_doc_chars"), 6)
                     .alias("top_2gram_char_frac")))
    return pstats.join(gtop, id_col)
