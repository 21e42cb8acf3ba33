"""Partition-shape helpers.

``fan_out`` fixes the "tiny input, expensive stage" mismatch: a small
parquet file arrives as a single split (one row group — unsplittable),
so every downstream Arrow UDF would run on ONE core no matter how many
the cluster has. At real scale (thousands of splits) the guard makes it
a no-op — the repartition only fires when the scan's parallelism is
below the cluster's, i.e. exactly when the shuffle it adds costs less
than the cores it unlocks.

This is the Spark analogue of the reference's thread-pool fan-out for
hashing (duplicate_finder.py:220-224) — there the unit of work was one
file, here it is one partition, and the fix is to make sure there are
at least as many as there are cores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` partitions (default: the
    session's default parallelism) iff it currently has fewer. Round-robin
    — no key, no skew; intended immediately before a per-row-expensive
    (UDF) stage, never after a partitioning the next stage relies on."""
    sc = df.sparkSession.sparkContext
    goal = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= goal:
        return df
    return df.repartition(goal)
