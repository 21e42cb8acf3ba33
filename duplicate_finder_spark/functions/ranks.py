"""Scale-safe global ranking (dense row numbers over a total order).

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves the
whole input through ONE reducer — Spark even warns ("No Partition
Defined for Window operation"). Fine on a report tail of a few
thousand rows; a non-starter when the "aggregated" table is itself
web-scale (one row per HOST at 10^12 pages is ~10^8 rows).

``global_rank`` produces the identical numbering fully in parallel —
the classic two-pass distributed sort-rank:

1. range-partition the input on the rank order (the same Exchange
   rangepartitioning a distributed orderBy uses, so partition p holds
   a contiguous slice of the total order: every row in p+1 sorts
   after every row in p);
2. rank WITHIN each partition (window partitioned by
   ``spark_partition_id()`` — parallel);
3. shift each partition's local ranks by the running total of earlier
   partitions' row counts. The offsets table has one row per
   PARTITION, so its cumulative-sum window is O(shuffle partitions) —
   the only single-reducer step, bounded by cluster width, not data
   size — and it is broadcast back onto the rows.

Consistency of ``spark_partition_id`` across the two uses: both the
counts branch and the rank branch are built from the SAME
repartitionByRange subplan, so Catalyst's ReuseExchange rule (on by
default, also under AQE) computes the range shuffle ONCE per action
and feeds both branches the same partitioning — the pids agree by
construction (plan-asserted in tests/test_plans.py). Across separate
actions the sampled range boundaries may differ, but the final rank
is the row's position in the total order — invariant to where the
partition boundaries fall — so results are stable without a persist.

Shuffle shape: two wide exchanges of the input (range, then hash on
pid for the window clustering) instead of the naive plan's one
exchange into a single reducer. Hashing ~P distinct pids into P
partitions can double up a few reducers (2x worst-case skew), still
parallel. The naive plan's lone reducer is the thing that dies first
at scale; two parallel passes over a per-host table is the cheap
trade.

Equality contract: for a total order whose key tuple is UNIQUE per
row (callers rank on a key that includes a unique tie-breaker), the
output equals single-partition ``row_number`` value-for-value — the
per-host corpus stats oracle asserts exactly that against DuckDB's
global ``row_number()``. With duplicate keys the numbering among ties
is a valid row_number but not deterministic across runs (range
partitioning co-locates equal keys, but intra-tie order is unspecified
— same caveat as any row_number without a full tie-break).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_gr_pid"
_LOCAL = "_gr_local"
_OFF = "_gr_off"


def global_rank(df: DataFrame, order: list[Column], *,
                out_col: str = "rank",
                num_partitions: int | None = None) -> DataFrame:
    """Add ``out_col`` = 1-based position of each row in the total
    order ``order`` (e.g. ``[F.desc("n_docs"), F.asc("host")]``)
    without collapsing the data onto one reducer.

    ``order`` must include a unique tie-breaker for run-to-run
    deterministic output (see module docstring).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # pid consistency between the counts branch and the rank branch
    # requires the range Exchange to be computed once and fed to both —
    # that is Catalyst's ReuseExchange rule. If it is disabled the two
    # branches may sample different range boundaries and the offsets
    # would shift the wrong partitions' ranks: fail loudly rather than
    # return silently wrong numbers.
    if spark.conf.get("spark.sql.exchange.reuse",
                      "true").lower() != "true":
        raise RuntimeError(
            "global_rank requires spark.sql.exchange.reuse=true "
            "(pid-keyed offset join depends on the range exchange being "
            "computed once for both branches)")

    ranged = (df.repartitionByRange(num_partitions, *order)
              .withColumn(_PID, F.spark_partition_id()))

    # one row per partition; the cumsum window is O(num_partitions)
    offs = (ranged.groupBy(_PID).agg(F.count("*").alias("_n"))
            .withColumn(_OFF, F.coalesce(
                F.sum("_n").over(
                    Window.orderBy(_PID)
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0)))
            .drop("_n"))

    w = Window.partitionBy(_PID).orderBy(*order)
    return (ranged.withColumn(_LOCAL, F.row_number().over(w))
            .join(F.broadcast(offs), _PID)
            .withColumn(out_col,
                        (F.col(_LOCAL) + F.col(_OFF)).cast("long"))
            .drop(_PID, _LOCAL, _OFF))
