"""Deterministic corpus sampling / data-mixing operators.

After dedup + curation, a training pipeline SAMPLES: fixed quotas per
stratum (language, source, quality bucket) or a token budget per
stratum (the data-mixing recipes of Dolma, RefinedWeb, The Pile). Two
requirements distinguish this from `df.sample()`:

1. **Determinism** — the same corpus must yield the same sample on
   every run, cluster size, and partitioning (reproducible training
   sets, resumable jobs). Spark's `sample()` is seed-stable only per
   partitioning, so the order key here is `md5(cast(id))` — a
   content-derived pseudo-random permutation that any engine computes
   identically (the DuckDB oracles reproduce it byte-for-byte).
2. **Budgets are in tokens, not rows** — quota filling walks docs in
   hash order and stops when the stratum's token budget is spent.

Scale notes (100 TB):
- Both operators are one window over the stratum key: a single
  exchange, rows carry (stratum, id, order key, n_tokens) — text
  stays out of the shuffle until the final semi-join back.
- Few-strata corpora make that exchange skewed by construction (all
  rows of one language land on one partition). For quota sampling at
  web scale, pre-filter with an approximate per-stratum threshold on
  the order key first (e.g. keep hash < k/N_stratum · 2) so the
  window sees a bounded candidate set; the semantics below stay the
  contract. The final join back to full rows is a broadcast when the
  sample is small, a doc_id shuffle otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sample_key", "stratified_sample", "token_budget_sample"]


def sample_key(id_col: Column) -> Column:
    """Deterministic pseudo-random order key: md5 of the id's string
    form. Engine-portable (md5 is md5 everywhere) — unlike xxhash64,
    whose seed/implementation is Spark-specific."""
    return F.md5(id_col.cast("string"))


def stratified_sample(docs: DataFrame, strata_col: str, k: int,
                      id_col: str = "doc_id") -> DataFrame:
    """The k hash-first docs of every stratum: (stratum, id, rank).

    Strata smaller than ``k`` are returned whole — quota sampling
    never invents rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = (Window.partitionBy(strata_col)
         .orderBy(sample_key(F.col(id_col)), id_col))
    return (docs.select(strata_col, id_col)
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k))


def token_budget_sample(docs: DataFrame, strata_col: str,
                        budget_tokens: int, n_tokens_col: Column,
                        id_col: str = "doc_id") -> DataFrame:
    """Fill each stratum's token budget in hash order.

    Docs are walked in ``sample_key`` order; a doc is kept while the
    RUNNING total including it stays ≤ ``budget_tokens`` — the first
    doc that would overflow the budget (and everything after it) is
    excluded, so a single over-long doc can block its stratum's tail:
    budgets are hard caps, not targets. Returns
    (stratum, id, n_tokens, cum_tokens).
    """
    if budget_tokens < 0:
        raise ValueError(f"budget must be >= 0, got {budget_tokens}")
    w = (Window.partitionBy(strata_col)
         .orderBy(sample_key(F.col(id_col)), id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (docs.select(strata_col, id_col,
                        n_tokens_col.cast("long").alias("n_tokens"))
            .withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .filter(F.col("cum_tokens") <= budget_tokens))


def softdedup_weights(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      round_to: int = 6) -> DataFrame:
    """Duplication-aware sampling weights — reweight instead of remove.

    The soft alternative to hard exact dedup discussed in recent
    pretraining-data work: keep every copy but weight each document by
    the inverse of its exact-content multiplicity, so the k copies of
    one text jointly contribute ONE document's worth of sampling mass
    (uniform coverage of unique content without deleting rows — useful
    when downstream stages want the duplicate signal, e.g. commonness
    features or citation counting). → (id, dup_count, weight).

    Scale shape: multiplicity via groupBy(sha2).count — partial (map-
    side) aggregation bounds hot hashes before the exchange — then one
    equi-join back on the 32-byte hash; a pathological billion-copy
    text is split by AQE's skew-join handling, which a window-count
    over the hash could not do (the window would pin the whole group
    on one reducer). Weight is rounded so the value is engine-portable
    (the DuckDB oracle reproduces it digit-for-digit).
    """
    from duplicate_finder_spark.functions.hashing import content_sha256
    h = content_sha256(text_col)
    counts = (docs.select(h.alias("_h"))
              .groupBy("_h").agg(F.count(F.lit(1)).alias("dup_count")))
    return (docs.select(F.col(id_col), h.alias("_h"))
            .join(counts, "_h")
            .select(F.col(id_col),
                    F.col("dup_count").cast("long").alias("dup_count"),
                    F.round(F.lit(1.0) / F.col("dup_count"), round_to)
                    .alias("weight")))
