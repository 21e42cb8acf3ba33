"""Output contracts of candidate_pairs_compact (round-4 doc-id
compaction of the candidates stage — BENCH/BASELINE.md "Per-stage
scaling" names that stage as the pipeline limiter, and most of its
shuffled bytes were the url string on every exploded band row).

Two contracts, matching the two pairing paths:
* non-hot path: the url-pair SET is identical to candidate_pairs —
  the compact plan is a pure wire-format change;
* hot path (forced hot_bucket_limit): the star CENTER differs
  (min-did vs min-url), so raw edges differ, but every bucket member
  still reaches the one representative — the clusters that
  connected components produces are identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from duplicate_finder_spark.config import PipelineConfig
from duplicate_finder_spark.operators.components import connected_components
from duplicate_finder_spark.operators.lsh import (candidate_pairs,
                                                  candidate_pairs_compact,
                                                  verify_pairs)
from duplicate_finder_spark.operators.minhash import signatures


def _sym_diff(a, b) -> int:
    return a.exceptAll(b).unionByName(b.exceptAll(a)).count()


def test_compact_pairs_equal_on_non_hot_path(spark, small_pages):
    pages, _ = small_pages
    cfg = PipelineConfig(num_perm=64, lsh_bands=16, jaccard_threshold=0.8)
    sigs = signatures(pages, cfg).persist()
    try:
        a = candidate_pairs(sigs, cfg)
        b = candidate_pairs_compact(sigs, cfg)
        assert a.count() > 0
        assert _sym_diff(a, b) == 0
        # ordering contract holds without a url-ordered pairing key
        assert b.filter(F.col("url_a") >= F.col("url_b")).count() == 0
    finally:
        sigs.unpersist()


def test_compact_clusters_equal_under_forced_hot_buckets(spark):
    # 12 identical docs (one band bucket of size 12 >> limit 3 in every
    # band — the star path MUST fire) plus a 2-doc near-dup pair and
    # singletons that keep the small-bucket path alive alongside it
    base = " ".join(f"tok{i % 37}x{i % 11}" for i in range(60))
    rows = [(f"https://hot.example/{i:04d}", base) for i in range(12)]
    rows += [("https://a.example/1", "alpha beta gamma delta " * 12),
             ("https://a.example/2", "alpha beta gamma delta " * 12),
             ("https://b.example/1", "unrelated words entirely " * 9)]
    pages = spark.createDataFrame(rows, "url string, text string")
    cfg = PipelineConfig(num_perm=64, lsh_bands=16, jaccard_threshold=0.8,
                         hot_bucket_limit=3)
    sigs = signatures(pages, cfg).persist()
    try:
        # star path fired in BOTH variants: the 12-doc hot bucket
        # yields 11 star edges, not C(12,2)=66 all-pairs
        hot = F.col("url_a").startswith("https://hot.") & \
            F.col("url_b").startswith("https://hot.")
        for fn in (candidate_pairs, candidate_pairs_compact):
            assert fn(sigs, cfg).filter(hot).count() == 11

        def clusters(fn):
            edges = verify_pairs(fn(sigs, cfg), sigs,
                                 cfg.jaccard_threshold, cfg) \
                .select(F.col("url_a").alias("src"),
                        F.col("url_b").alias("dst"))
            return connected_components(edges)

        ca = clusters(candidate_pairs)
        cb = clusters(candidate_pairs_compact)
        assert ca.count() > 0
        assert _sym_diff(ca, cb) == 0
    finally:
        sigs.unpersist()
