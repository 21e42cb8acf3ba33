"""global_rank (functions/ranks.py) — the scale-safe replacement for
``row_number() OVER (ORDER BY ...)``.

Contract under test: for any total order with a unique tie-breaker,
the parallel two-pass rank equals the naive single-partition window
value-for-value, at every partition-count regime (more partitions
than rows, fewer, exactly one), and the plan contains NO
unpartitioned Window over the data (the single-reducer shape it
exists to eliminate) — the only global window is the O(P) cumsum over
the per-partition counts table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from duplicate_finder_spark.functions.ranks import global_rank


def _rows(spark, n, seed=7):
    # adversarial key distribution: heavy ties on k (forces multi-row
    # runs that must co-locate), unique tie-breaker u
    return (spark.range(n)
            .select(F.col("id").alias("u"),
                    F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(5))
                    .alias("k")))


def _naive(df, order):
    w = Window.orderBy(*order)
    return df.withColumn("rank", F.row_number().over(w))


@pytest.mark.parametrize("n,parts", [(0, 4), (1, 4), (7, 32), (500, 4),
                                     (500, 1), (500, 1000)])
def test_equals_naive_window(spark, n, parts):
    df = _rows(spark, n)
    order = [F.desc("k"), F.asc("u")]
    got = {(r["u"], r["rank"])
           for r in global_rank(df, order, num_partitions=parts).collect()}
    want = {(r["u"], r["rank"]) for r in _naive(df, order).collect()}
    assert got == want


def test_composite_order_and_out_col(spark):
    df = _rows(spark, 200)
    order = [F.asc("k"), F.desc("u")]
    got = global_rank(df, order, out_col="pos", num_partitions=8)
    assert "pos" in got.columns
    want = {r["u"]: r["rank"] for r in _naive(df, order).collect()}
    for r in got.collect():
        assert r["pos"] == want[r["u"]]


def test_rank_is_dense_and_stable_across_actions(spark):
    # rank = position in the total order, invariant to where the range
    # boundaries fall — so two separate actions must agree even though
    # each resamples its own boundaries
    df = _rows(spark, 300)
    order = [F.desc("k"), F.asc("u")]
    out = global_rank(df, order, num_partitions=16)
    a = sorted(r["rank"] for r in out.collect())
    b = sorted(r["rank"] for r in out.collect())
    assert a == list(range(1, 301))
    assert a == b


def test_plan_has_no_unpartitioned_data_window(spark):
    """The data-sized window must be partitioned (by pid); the only
    global-order window allowed is the one over the per-partition
    counts (O(num_partitions) rows, post-aggregate)."""
    df = _rows(spark, 100)
    out = global_rank(df, [F.desc("k"), F.asc("u")], num_partitions=8)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert windows, plan
    data_windows = [ln for ln in windows if "_gr_pid" in ln]
    # every window over the data is pid-partitioned
    for ln in data_windows:
        assert "windowspecdefinition(_gr_pid" in ln, ln
    # the remaining window(s) are the counts cumsum — they sit above
    # the Aggregate over pid, never over the raw rows
    cumsum = [ln for ln in windows if ln not in data_windows]
    for ln in cumsum:
        assert "_n" in ln, ln
    # range partitioning present (the parallel total-order exchange)
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in phys, phys


def test_host_stats_rank_matches_naive(spark):
    """host_stats now routes through global_rank; its numbering must
    still equal the naive global window on the aggregated table."""
    from duplicate_finder_spark.operators.domains import host_stats
    rows = []
    for h, n in (("big.example", 9), ("mid.example", 4),
                 ("tiny.example", 1), ("also4.example", 4)):
        rows += [(f"https://{h}/p/{i:03d}", f"text {h} {i}")
                 for i in range(n)]
    pages = spark.createDataFrame(rows, "url string, text string")
    got = {r["host"]: r["n_docs_rank"] for r in host_stats(pages).collect()}
    assert got == {"big.example": 1, "also4.example": 2,
                   "mid.example": 3, "tiny.example": 4}


def test_global_rank_guard_checks_real_conf_key(spark):
    """r5 ADVICE: the exchange-reuse guard must read the key Spark
    actually has ('spark.sql.exchange.reuse') — the old
    'spark.sql.exchangeReuseEnabled' does not exist, so the guard
    could never fire."""
    from duplicate_finder_spark.functions.ranks import global_rank
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        with pytest.raises(RuntimeError, match="exchange.reuse"):
            global_rank(spark.range(10), [F.asc("id")])
    finally:
        spark.conf.set("spark.sql.exchange.reuse", "true")
    assert global_rank(spark.range(10), [F.asc("id")]).count() == 10
