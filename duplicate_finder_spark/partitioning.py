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

The guard reads SCAN-LEVEL facts only (``df.inputFiles()``) — never
``df.rdd``, which would force a plan→RDD translation on every call and
report the static pre-AQE partition count anyway. The heuristic is
pre-AQE by construction: one input file may split into several tasks
(so ``len(inputFiles)`` under-counts splits and the repartition can be
slightly conservative), and a non-file source (in-memory, post-shuffle)
reports no files, in which case the fan-out is applied — harmless for
the intended use (immediately before a per-row-expensive UDF stage on
freshly scanned input) and cheaper than misjudging a one-split scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` partitions (default: the
    session's default parallelism) unless the scan already provides at
    least that many input files. Round-robin — no key, no skew;
    intended immediately before a per-row-expensive (UDF) stage, never
    after a partitioning the next stage relies on."""
    sc = df.sparkSession.sparkContext
    goal = target or sc.defaultParallelism
    n_files = len(df.inputFiles())
    if n_files >= goal:
        return df
    return df.repartition(goal)
