"""Benchmark decontamination + repeated-n-gram census (training-data ops).

Web-scale training pipelines must answer two n-gram questions the
reference's whole-file hash grouping (duplicate_finder.py: group-by
sha256) cannot:

1. **Eval contamination** — what fraction of a held-out benchmark's
   word n-grams appear anywhere in the training corpus? (GPT-3 App. C
   used 13-gram overlap; Lee et al. 2021 "Deduplicating Training Data
   Makes Language Models Better" used 50-token spans.) A doc above a
   threshold is decontaminated out of the eval set (or the train docs
   containing it are dropped).
2. **Repeated-n-gram census** — how much verbatim n-gram mass recurs
   across distinct documents? (memorization-risk audit; the same
   statistic drives Lee et al.'s ExactSubstr dedup decision.)

Scale design (100 TB corpus, small eval set):
- n-grams are generated LINEARLY in the JVM: the token array is zipped
  with shifted copies of itself, one ``zip_with`` per extra gram word —
  never a lambda-captured ``slice`` over the whole array (the O(n²)
  trap documented at functions/text.py:40). No Python UDFs anywhere.
- Contamination joins the HUGE side (corpus n-grams) against a
  BROADCAST of the eval set's distinct n-grams — one pass over the
  corpus, zero shuffle of corpus rows. Matches collapse to distinct
  grams (tiny: bounded by the eval vocabulary) before the final join
  back onto per-eval-doc counts. The broadcast probe key is
  ``xxhash64(gram)`` (8-byte comparisons in the hash table); every hit
  is confirmed by string equality so a 64-bit collision can only cost
  CPU, never a wrong count. At 10^12 docs the same shape holds — the
  broadcast side depends only on eval-set size.
- The census is a map-side-combinable double aggregation on
  ``sha2(gram, 256)`` — the gram text never shuffles, and 256-bit keys
  keep ~10^13 corpus grams far below the birthday bound (the same
  argument as operators/paragraphs.py's corpus-wide keep-first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duplicate_finder_spark.functions.text import tokens

__all__ = ["ngrams", "contamination_check", "ngram_census"]


def ngrams(toks: Column, n: int) -> Column:
    """Overlapping word n-grams of a token-array column, linear time.

    ``toks`` MUST be a bound attribute (select the array into its own
    column first). Docs with fewer than ``n`` tokens yield an empty
    array — standard for contamination checks, where a fragment
    shorter than the probe length is not evidence.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n == 1:
        return toks
    m = F.size(toks) - F.lit(n - 1)  # number of n-grams
    acc = F.slice(toks, 1, m)
    for j in range(1, n):
        acc = F.zip_with(acc, F.slice(toks, 1 + j, m),
                         lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(toks) < n, F.array().cast("array<string>")) \
            .otherwise(acc)


def _doc_grams(docs: DataFrame, n: int, id_col: str,
               text_col: str) -> DataFrame:
    """(id, gram) with within-doc duplicates removed — narrow."""
    t = docs.select(id_col, tokens(text_col).alias("_toks"))
    return t.select(
        id_col,
        F.explode(F.array_distinct(ngrams(F.col("_toks"), n))).alias("gram"))


def contamination_check(train: DataFrame, eval_docs: DataFrame, n: int = 8,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Per-eval-doc n-gram overlap with the training corpus.

    Returns (id, n_grams, n_hit, contamination_frac): of the eval doc's
    distinct word n-grams, how many occur verbatim in ANY training doc,
    and the fraction. Eval docs with fewer than ``n`` tokens have zero
    grams and contamination 0.0 (nothing probeable ⇒ nothing proven).

    One pass over ``train``; the eval side is broadcast. See the module
    docstring for why this shape survives 10^12 training docs.
    """
    # explode_outer keeps eval docs with zero grams as a NULL-gram row,
    # so "every eval doc gets a row" needs no second scan of eval_docs
    # + distinct + join-back (two exchanges fewer): n_grams counts the
    # non-null grams, which is 0 for exactly those docs
    t = eval_docs.select(id_col, tokens(text_col).alias("_toks"))
    eval_grams = (t.select(
        id_col,
        F.explode_outer(F.array_distinct(ngrams(F.col("_toks"), n)))
         .alias("gram"))
        .withColumn("_h", F.xxhash64("gram")))
    # tiny: distinct gram strings of the eval set, keyed by 64-bit hash
    probe = (eval_grams.filter(F.col("gram").isNotNull())
             .select("_h", F.col("gram").alias("_egram")).distinct())

    train_toks = train.select(tokens(text_col).alias("_toks"))
    train_grams = train_toks.select(
        F.explode(ngrams(F.col("_toks"), n)).alias("tgram"))
    hit_grams = (train_grams
                 .join(F.broadcast(probe),
                       F.xxhash64("tgram") == F.col("_h"), "inner")
                 .filter(F.col("tgram") == F.col("_egram"))  # collision guard
                 .select(F.col("_egram").alias("gram"))
                 .distinct())

    return (eval_grams
            .join(hit_grams.withColumn("_hit", F.lit(1)), "gram", "left")
            .groupBy(id_col)
            .agg(F.count("gram").cast("long").alias("n_grams"),
                 F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
                  .cast("long").alias("n_hit"))
            .select(id_col, "n_grams", "n_hit",
                    F.when(F.col("n_grams") == 0, F.lit(0.0))
                     .otherwise(F.round(F.col("n_hit") / F.col("n_grams"), 6))
                     .alias("contamination_frac")))


def ngram_census(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Histogram of cross-document n-gram repetition.

    For each distinct n-gram, count the DISTINCT documents containing
    it; return (n_docs, n_grams) — how many grams appear in exactly
    ``n_docs`` documents, for n_docs >= 2. The n_docs=1 bucket is
    excluded: at corpus scale it dwarfs everything and carries no
    dedup signal.

    Two map-side-combinable aggregations on sha2(gram); gram text never
    shuffles.
    """
    per_doc = _doc_grams(docs, n, id_col, text_col) \
        .select(id_col, F.sha2(F.col("gram"), 256).alias("gh"))
    gram_docs = (per_doc.groupBy("gh")
                 .agg(F.count("*").cast("long").alias("n_docs")))
    return (gram_docs.filter(F.col("n_docs") >= 2)
            .groupBy("n_docs")
            .agg(F.count("*").cast("long").alias("n_grams")))
