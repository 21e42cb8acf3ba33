"""Bench harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

The headline metric is dedup docs/sec over the self-union exact +
near-dup pipeline; per-query wall times are reported individually.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


HEADLINE = [
    "exact_dup_decisions",
    "minhash_lsh_pairs",
    "cc_clusters",
    "ngram_jaccard_pairs",
    "token_stats",
    "quality_scores",
    "fingerprint_dups",
    "ann_cosine_topk",
    "tpch_pricing_summary",
    "nation_order_revenue",
    # round 4: webtext-payload paragraph ops (headline dedup metric is
    # unchanged — these add per-query walls only)
    "paragraph_dedup_stats",
    "gopher_repetition",
    "eval_contamination",
    "exact_substr_apply",
    "semantic_dedup",
    "dsir_select",
    "gopher_quality_filter",
    "lm_perplexity",
    "image_neardup_pairs",
    "video_neardup_pairs",
    "bpe_train_merges",
    "source_mixture_weights",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entrymod
    from duplicate_finder_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    qs = entrymod.queries()

    # warm the JVM and the Python-UDF worker pool (one daemon per core —
    # first pandas UDF otherwise pays ~NCPU × (spawn + import pandas))
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(100000).repartition(int(cpus)) \
        .select(_warm("id")).write.format("noop").mode("overwrite").save()

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # per-query best-of-2 (VERDICT r3 #6): one timed pass per query let
    # a single host hiccup on this shared VM (documented 2-4x swings)
    # masquerade as a round-over-round regression on untouched code.
    # Both walls are reported; the min is the per-query signal.
    timings: dict[str, float] = {}
    all_walls: dict[str, list[float]] = {}
    for name in HEADLINE:
        walls = []
        for _ in range(2):
            # BPE training memoizes its learned merges driver-side so
            # the two contract queries share one training run; a timed
            # pass must train cold
            entrymod._BPE_MERGES_CACHE.clear()
            t0 = time.time()
            # noop sink forces FULL evaluation of every output column —
            # count() would let Catalyst prune unreferenced UDF columns
            # and under-report scan+compute cost
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            # queries are self-contained: drop any cache a query
            # persisted so every pass is measured cold, not against a
            # shrinking heap (cached plans also match structurally —
            # pass 2 would otherwise silently reuse pass 1's persists)
            spark.catalog.clearCache()
        timings[name] = min(walls)
        all_walls[name] = walls

    dedup_secs = (timings["exact_dup_decisions"]
                  + timings["minhash_lsh_pairs"] + timings["cc_clusters"])
    # docs processed by the dedup chain: self-union (2x) + near-dup + CC
    dedup_docs = n_docs * 2 + n_docs * 2
    value = round(dedup_docs / dedup_secs, 1) if dedup_secs else 0.0

    print(json.dumps({
        "metric": "dedup_docs_per_sec",
        "value": value,
        "unit": "docs/sec",
        "queries": timings,
        "queries_all_walls": all_walls,
        "total_sec": round(sum(timings.values()), 3),
        "n_docs": n_docs,
        "cpus": int(cpus),
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
