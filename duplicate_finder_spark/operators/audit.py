"""Dedup-quality audit: recall / precision of a detected pair set
against a ground-truth pair set, as a first-class pipeline output.

The north rule's headline metric — dup-pair recall >= 0.99 — is
elsewhere evidenced indirectly (minhash_lsh_pairs equals the exact
n-gram oracle value-for-value in the driver gate). This operator makes
the metric itself a query output a user can run on their own corpus
against their own truth (a labeled sample, a prior engine's output, or
an exact-but-expensive pass over a slice), the way the reference's user
would eyeball its printed duplicate groups against what they know is on
disk (duplicate_finder.py:302-341 prints every group for inspection;
at web scale "inspect" must become a measured recall/precision row).

Scale notes: both inputs are canonicalized (least/greatest) and
distinct-ed, then hit ONE equi-join on the canonical pair key — a
single hash exchange per side, JVM-only expressions throughout, no
Python, no collect. The output is one row per stratum (plus the
roll-up), so the join's result is consumed map-side by a
partial-aggregating count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Order-insensitive distinct pair set keyed (pa < pb)."""
    return (pairs.select(F.least(F.col(a), F.col(b)).alias("pa"),
                         F.greatest(F.col(a), F.col(b)).alias("pb"))
            .filter(F.col("pa") != F.col("pb"))
            .distinct())


def pair_recall_audit(detected: DataFrame, truth: DataFrame,
                      a_col: str = "url_a", b_col: str = "url_b",
                      strata_col: str | None = None) -> DataFrame:
    """-> (stratum?, n_truth, n_detected, n_hit, recall, precision).

    ``detected`` and ``truth`` are pair tables with columns ``a_col``,
    ``b_col`` (order and duplicates irrelevant — both sides are
    canonicalized). ``strata_col``, if given, must be a column of
    ``truth`` (e.g. a dup-type label or a similarity band); the audit
    then emits one row per stratum — recall is diagnosable per regime
    (near-dup recall usually dies in one band first, not uniformly) —
    plus an ``_overall`` roll-up row. Precision is only defined
    corpus-wide (a false positive belongs to no truth stratum), so the
    per-stratum rows carry NULL precision and the roll-up carries the
    real value.
    """
    det = _canon(detected, a_col, b_col)
    if strata_col is None:
        tru = _canon(truth, a_col, b_col)
        hit = tru.join(det, ["pa", "pb"], "left_semi")
        return (tru.agg(F.count("*").alias("n_truth"))
                .crossJoin(det.agg(F.count("*").alias("n_detected")))
                .crossJoin(hit.agg(F.count("*").alias("n_hit")))
                .select(
                    "n_truth", "n_detected", "n_hit",
                    (F.col("n_hit") / F.col("n_truth"))
                    .alias("recall"),
                    (F.col("n_hit") / F.col("n_detected"))
                    .alias("precision")))
    tru = (truth.select(F.least(F.col(a_col), F.col(b_col)).alias("pa"),
                        F.greatest(F.col(a_col), F.col(b_col)).alias("pb"),
                        F.col(strata_col).alias("stratum"))
           .filter(F.col("pa") != F.col("pb"))
           .groupBy("pa", "pb").agg(F.min("stratum").alias("stratum")))
    joined = tru.join(det.withColumn("_hit", F.lit(1)),
                      ["pa", "pb"], "left")
    per = (joined.groupBy("stratum")
           .agg(F.count("*").alias("n_truth"),
                F.count("_hit").alias("n_hit")))
    per_rows = per.select(
        "stratum", "n_truth",
        F.lit(None).cast("long").alias("n_detected"),
        "n_hit",
        (F.col("n_hit") / F.col("n_truth")).alias("recall"),
        F.lit(None).cast("double").alias("precision"))
    # lazy 1x1 crossJoin instead of det.count(): no driver action at
    # plan-construction time, and the count aggregate is map-partial
    overall = (per.agg(F.sum("n_truth").alias("n_truth"),
                       F.sum("n_hit").alias("n_hit"))
               .crossJoin(det.agg(F.count("*").alias("n_detected")))
               .select(F.lit("_overall").alias("stratum"),
                       "n_truth", "n_detected", "n_hit",
                       (F.col("n_hit") / F.col("n_truth"))
                       .alias("recall"),
                       (F.col("n_hit") / F.col("n_detected"))
                       .alias("precision")))
    return per_rows.unionByName(overall)
