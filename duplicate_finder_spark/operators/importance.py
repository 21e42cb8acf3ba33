"""DSIR-style importance resampling (Xie et al. 2023, arXiv:2302.03169).

Dedup decides what is REDUNDANT; data selection decides what is
RELEVANT. DSIR ("Data Selection for Language Models via Importance
Resampling") scores every raw-crawl document by how much it resembles a
small trusted target corpus, using bag-of-hashed-n-gram language
models:

1. hash each document's unigrams + bigrams into ``n_buckets`` feature
   buckets;
2. fit multinomial feature distributions over the TARGET sample and the
   RAW corpus (Laplace-smoothed);
3. per raw doc, the log importance weight is
   Σ_occurrences [log p̂_target(f) − log p̂_raw(f)];
4. keep the top-weighted docs (the paper resamples with Gumbel noise;
   the deterministic top-k is the engine-invariant variant, and a
   seeded Gumbel option is provided for statistical fidelity).

This generalizes the reference's select-by-predicate stage
(duplicate_finder.py filters by size/kind before grouping) to
distribution-level selection, the step every web-scale pretraining
pipeline runs between dedup and training.

Scale shape (10^12 raw docs, small target):

* feature hashing is pure JVM expression algebra — whitespace tokens,
  bigrams via one linear ``zip_with``, bucket = 32 bits of
  ``sha2(gram)`` mod ``n_buckets`` (sha2 so the DuckDB oracle derives
  identical buckets; gram TEXT never shuffles);
* both distribution fits are map-side-combinable groupBy counts whose
  exchange is bounded by ``n_buckets`` rows per map task, regardless of
  corpus size;
* the log-ratio table is ≤ ``n_buckets`` rows (65k default) —
  broadcast; scoring the raw corpus is one narrow pass (explode →
  broadcast hash join → per-doc partial-agg sum), the corpus is never
  shuffled except as one combined row per doc;
* weights are INTEGER micro-log-units (round(1e6·Δlog)): the per-doc
  sum is order-independent, so the score is bit-identical across
  partitionings, engines, and reruns — the same determinism contract
  as the sampling operators (operators/sampling.py);
* report-sized top-k plans as TakeOrderedAndProject (per-partition
  heaps, only k rows reach the driver-side merge); selection-sized k
  (billions kept) switches to the fully parallel ``global_rank`` +
  filter path — see ``dsir_select``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from duplicate_finder_spark.functions.text import tokens

__all__ = ["hashed_feature_counts", "dsir_log_ratios", "dsir_weights",
           "dsir_select"]


def _bucket(gram: Column, n_buckets: int) -> Column:
    """First 32 bits of sha2(gram) mod n_buckets — engine-portable
    (DuckDB: CAST(concat('0x', substr(sha256(g),1,8)) AS BIGINT))."""
    return F.pmod(
        F.conv(F.substring(F.sha2(gram, 256), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets))


def _doc_feats(docs: DataFrame, n_buckets: int, id_col: str,
               text_col: str, keep_empty: bool = False) -> DataFrame:
    """(id, feat) — one row per unigram and bigram OCCURRENCE (counts
    matter for multinomial fits, so no distinct). Narrow: explode +
    hash, no shuffle.

    ``keep_empty`` (scorer path only): zero-gram docs keep one
    NULL-feat row (explode_outer), so per-doc aggregation can cover
    every doc without a second corpus scan + join-back. The fit paths
    MUST leave it False — a null feat row would add a spurious group
    to the distribution counts."""
    t = docs.select(id_col, tokens(text_col).alias("_toks"))
    m = F.size("_toks") - F.lit(1)
    bigrams = F.when(F.size("_toks") < 2,
                     F.array().cast("array<string>")) \
        .otherwise(F.zip_with(F.slice("_toks", 1, m),
                              F.slice("_toks", 2, m),
                              lambda a, b: F.concat_ws(" ", a, b)))
    exp = F.explode_outer if keep_empty else F.explode
    grams = t.select(id_col, exp(F.concat("_toks", bigrams)).alias("_g"))
    return grams.select(id_col, _bucket(F.col("_g"), n_buckets)
                        .alias("feat"))


def hashed_feature_counts(docs: DataFrame, n_buckets: int = 1 << 16,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """→ (feat, n): corpus-wide hashed unigram+bigram occurrence
    counts. The exchange carries ≤ n_buckets pre-combined rows per map
    task — fitting the distribution costs one narrow pass at any
    corpus size."""
    return (_doc_feats(docs, n_buckets, id_col, text_col)
            .groupBy("feat").agg(F.count("*").alias("n")))


def dsir_log_ratios(raw: DataFrame, target: DataFrame,
                    n_buckets: int = 1 << 16, alpha: float = 1.0,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """→ (feat, lr_micro): Laplace-smoothed
    round(1e6·[log p̂_target(feat) − log p̂_raw(feat)]) as BIGINT.

    Covers every feat present in either corpus (absent side smoothed to
    alpha mass); ≤ n_buckets rows — broadcast it into the scorer.
    """
    ct = hashed_feature_counts(target, n_buckets, id_col, text_col) \
        .withColumnRenamed("n", "n_t")
    cr = hashed_feature_counts(raw, n_buckets, id_col, text_col) \
        .withColumnRenamed("n", "n_r")
    counts = (ct.join(cr, "feat", "full_outer")
              .select("feat",
                      F.coalesce("n_t", F.lit(0)).alias("n_t"),
                      F.coalesce("n_r", F.lit(0)).alias("n_r")))
    # totals as a broadcast 1-row aggregate of the (≤ n_buckets-row)
    # count table — no driver action, no second pass over either corpus
    tots = counts.agg(F.sum("n_t").cast("long").alias("tt"),
                      F.sum("n_r").cast("long").alias("tr"))
    joined = counts.crossJoin(F.broadcast(tots))
    am = alpha * n_buckets
    lr = (F.log((F.col("n_t") + F.lit(alpha)) / (F.col("tt") + F.lit(am)))
          - F.log((F.col("n_r") + F.lit(alpha)) / (F.col("tr") + F.lit(am))))
    return joined.select(
        "feat", F.round(lr * F.lit(1e6)).cast("long").alias("lr_micro"))


def dsir_weights(raw: DataFrame, ratios: DataFrame,
                 n_buckets: int = 1 << 16, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """→ (id, n_feats, weight_micro): per-doc importance weight — the
    integer sum of lr_micro over the doc's feature OCCURRENCES (docs
    with zero tokens get weight 0 and n_feats 0). ``ratios`` is
    broadcast; the raw corpus shuffles one combined row per doc."""
    # keep_empty: zero-gram docs ride through as one NULL-feat row
    # (counted by neither n_feats nor the weight sum), so weight 0 /
    # n_feats 0 rows need no third corpus scan + distinct + join-back —
    # two exchanges and a pass fewer than the base-table restore
    feats = _doc_feats(raw, n_buckets, id_col, text_col, keep_empty=True)
    return (feats.join(F.broadcast(ratios), "feat", "left")
            .groupBy(id_col)
            .agg(F.count("feat").cast("long").alias("n_feats"),
                 F.sum(F.coalesce("lr_micro", F.lit(0)))
                  .cast("long").alias("weight_micro"))
            .select(id_col,
                    "n_feats",
                    F.coalesce("weight_micro", F.lit(0)).cast("long")
                     .alias("weight_micro")))


def dsir_select(raw: DataFrame, target: DataFrame, k: int,
                n_buckets: int = 1 << 16, alpha: float = 1.0,
                gumbel_seed: int | None = None,
                id_col: str = "doc_id", text_col: str = "text",
                topk_path_max_k: int = 100_000) -> DataFrame:
    """→ (id, n_feats, weight_micro, rank): the ``k`` raw docs most
    resembling ``target``.

    Deterministic variant (default): rank by (weight_micro desc, id
    asc) — engine-invariant, fully oracle-able. With ``gumbel_seed``,
    rank by weight_micro/1e6 + Gumbel(0,1) noise derived from
    xxhash64(id, seed) — the paper's importance RESAMPLING (without
    noise, top-k over-selects the mode of the target distribution);
    deterministic per seed, Spark-side contract only.

    Two physical paths, identical output (order includes the unique
    ``id_col`` tie-break, so the ranking is a total order):

    * ``k ≤ topk_path_max_k``: orderBy+limit — plans as
      TakeOrderedAndProject (per-partition heaps, k rows to the
      driver-side merge), then a window re-derives rank over the k
      kept rows only. Cheapest when k is report-sized, but both the
      driver merge and the rank window hold all k rows in ONE place.
    * ``k > topk_path_max_k``: a pretraining selection pass keeps
      billions of rows ("top 30% of the crawl"), which no driver heap
      or single reducer survives — rank the FULL scored table with
      ``global_rank`` (functions/ranks.py: range-partition +
      broadcast partition offsets, fully parallel) and filter
      ``rank ≤ k``. Two parallel exchanges of one-row-per-doc scores,
      zero driver involvement, any k.
    """
    w = dsir_weights(raw, dsir_log_ratios(raw, target, n_buckets, alpha,
                                          id_col, text_col),
                     n_buckets, id_col, text_col)
    if gumbel_seed is None:
        order = [F.desc("weight_micro"), F.asc(id_col)]
    else:
        u = (F.pmod(F.xxhash64(F.col(id_col), F.lit(gumbel_seed)),
                    F.lit(1_000_000_007)) + 1) / 1_000_000_009.0
        w = w.withColumn("_g",
                         F.col("weight_micro") / 1e6 - F.log(-F.log(u)))
        order = [F.desc("_g"), F.asc(id_col)]
    if k <= topk_path_max_k:
        rank = F.row_number().over(Window.orderBy(*order))
        out = (w.orderBy(*order).limit(k)
               .withColumn("rank", rank))
    else:
        from duplicate_finder_spark.functions.ranks import global_rank
        out = (global_rank(w, order, out_col="rank")
               .filter(F.col("rank") <= k))
    return out.select(id_col, "n_feats", "weight_micro",
                      F.col("rank").cast("long").alias("rank"))
