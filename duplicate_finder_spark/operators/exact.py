"""Exact-duplicate detection: the reference's 4-stage core as DataFrame ops.

Semantics (cites into /root/reference/duplicate_finder):
* filters F1-F4   ≙ duplicate_finder.py:138-164 (size bounds incl. the
  falsy-zero quirk at :145-148; include globs win over exclude,
  config :36-38)
* A1/A2 size prefilter ≙ :123-196 — group by size, drop singleton groups
  ("cannot be duplicates") BEFORE any hashing. This is a semi-join
  reduction; at scale it's the difference between hashing 100 TB and
  hashing only the colliding fraction.
* A3/A4 hash group ≙ :198-250 — SHA-256 per row, keep hash groups with
  count>1. The thread pool + lock (:220-234) dissolve into Spark's
  partial/final hash aggregation.
* V1 verify        ≙ :427-463 — byte-compare within hash groups. Grouping
  by the full SHA-256 of the exact bytes subsumes it (collision odds
  ~2^-128); a paranoid mode groups by (sha256, length, first/last bytes).
* W1/W3 ordering   ≙ :246-252 — members sorted by url; deterministic
  cluster ids via dense_rank over the content hash.

Scale notes: the size-count side of the semi-join is tiny after the
HAVING (distinct sizes with count>1), so it is broadcast — no shuffle of
the big table for the prefilter. The hash groupBy is the one required
shuffle; AQE coalesces post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duplicate_finder_spark.config import PipelineConfig
from duplicate_finder_spark.functions.globs import (exclude_predicate,
                                                    include_predicate)
from duplicate_finder_spark.functions.hashing import (content_sha256,
                                                      content_xxhash64)

SIZE_COL = "size"


def apply_filters(pages: DataFrame, cfg: PipelineConfig,
                  url_col: str = "url", text_col: str = "text") -> DataFrame:
    """F1-F4: validity, size range (falsy-0 disables a bound), include
    then exclude globs. All predicates are JVM-side and pushdown-able."""
    df = pages.filter(F.col(text_col).isNotNull())  # F1 analogue
    df = df.withColumn(SIZE_COL, F.length(F.col(text_col)).cast("long"))
    if cfg.min_size:   # falsy 0/None → no lower bound (ref :145-146)
        df = df.filter(F.col(SIZE_COL) >= cfg.min_size)
    if cfg.max_size:   # falsy 0/None → no upper bound (ref :147-148)
        df = df.filter(F.col(SIZE_COL) <= cfg.max_size)
    df = df.filter(include_predicate(cfg.include_patterns, url_col))
    df = df.filter(exclude_predicate(cfg.exclude_patterns, url_col))
    return df


def size_prefilter(df: DataFrame, size_col: str = SIZE_COL) -> DataFrame:
    """A2: keep only rows whose size occurs more than once.

    Implemented as groupBy(size).count HAVING>1, broadcast back as a
    LEFT SEMI join — the big side never shuffles.
    """
    multi = (df.groupBy(size_col).count()
               .filter(F.col("count") > 1)
               .select(size_col))
    return df.join(F.broadcast(multi), size_col, "left_semi")


def hash_prefilter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Optional second-level reduction: xxhash64 group HAVING>1 before the
    expensive SHA-256. Same trick as A2 one level deeper.

    NOT in the default path: unlike the size domain (bounded, broadcast-
    able), the colliding-xxhash set grows with the dup fraction of the
    corpus — billions of keys at 10^12 docs — so the semi-join is left
    to AQE (shuffle join at scale, broadcast when the runtime stats say
    it fits). Only worth it when SHA-256 compute, not scan I/O, is the
    bottleneck; ``exact_clusters`` instead hashes size-survivors directly
    and never shuffles text at all.
    """
    with_h = df.withColumn("_xx", content_xxhash64(text_col))
    multi = (with_h.groupBy("_xx").count()
                   .filter(F.col("count") > 1).select("_xx"))
    return with_h.join(multi, "_xx", "left_semi").drop("_xx")


def exact_clusters(pages: DataFrame, cfg: PipelineConfig,
                   url_col: str = "url", text_col: str = "text",
                   paranoid: bool = False) -> DataFrame:
    """Full exact-dup pipeline → (cluster_id, content_hash, url, size, rank).

    rank is the keep-first order within the cluster (url ascending —
    deterministic, ref duplicate_finder.py:246-248,309); cluster_id is a
    dense enumeration over content hashes (ref "Group i/N", :267).
    """
    df = apply_filters(pages, cfg, url_col, text_col)
    df = size_prefilter(df)
    df = df.withColumn("content_hash", content_sha256(text_col))
    # project narrow BEFORE the shuffle: text never leaves the scan stage
    # — the one shuffle of this pipeline carries (url, size, hash) only
    df = df.select(url_col, SIZE_COL, "content_hash")
    part_key = ["content_hash", SIZE_COL] if paranoid else ["content_hash"]

    # one exchange does everything: rank and HAVING-count>1 are two
    # Window nodes over the SAME partitioning, so Catalyst plans a single
    # hash-partition shuffle and no join. (The old shape — groupBy +
    # semi-join back — either broadcasts the colliding-hash set, which
    # does not fit at 10^12 docs, or shuffles the big side twice.)
    w = Window.partitionBy(*part_key)
    w_rank = w.orderBy(url_col)

    # cluster_id IS the content hash: stable, shuffle-free, no global
    # ordering. (A dense integer enumeration would need a single-partition
    # Window.orderBy — a non-starter at 100 TB; the "Group i/N" labels the
    # reference prints (:267) are produced at the tiny report tail by
    # ``enumerate_clusters`` instead.)
    return (df
            .withColumn("rank", F.row_number().over(w_rank))
            .withColumn("_cnt", F.count("*").over(w))
            .filter(F.col("_cnt") > 1).drop("_cnt")
            .withColumn("cluster_id", F.col("content_hash"))
            .select("cluster_id", "content_hash", url_col, SIZE_COL, "rank"))


def cluster_stats(clusters: DataFrame) -> DataFrame:
    """A5/A6 per-cluster stats + the comparison-count estimator
    k(k-1)/2 (ref duplicate_finder.py:431-435)."""
    return (clusters.groupBy("cluster_id", "content_hash")
            .agg(F.count("*").alias("group_size"),
                 F.max("size").alias("doc_size"),
                 F.sum("size").alias("total_bytes"))
            .withColumn("reclaimable_bytes",
                        F.col("total_bytes") - F.col("doc_size"))
            .withColumn("n_comparisons",
                        (F.col("group_size") * (F.col("group_size") - 1) / 2)
                        .cast("long")))


def enumerate_clusters(stats: DataFrame) -> DataFrame:
    """W3 'Group i/N' labels — only on the (small) per-cluster stats table,
    after aggregation, never on the full rowset."""
    w = Window.orderBy("content_hash")
    return stats.withColumn("group_no", F.row_number().over(w))


def order_clusters(stats: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """O1/O2/O3: optional ordering of reported groups; O1 wins if both
    (ref duplicate_finder.py:251-253)."""
    if cfg.sort_by_group_size:
        return stats.orderBy(F.desc("group_size"), "content_hash")
    if cfg.sort_by_file_size:
        return stats.orderBy(F.desc("doc_size"), "content_hash")
    return stats
