"""Event-stream batch operators: sessionization, time rollups, exact
event dedup.

These generalize the reference's group-by-key → having count>1 → keep
rank-1 pipeline (duplicate_finder.py:176-250, 297-309) from file rows to
event rows: an "exact duplicate event" is a (user_id, event_type, value)
collision, the kept member is the minimum event_id — the same
deterministic keep-first rule as the reference's sorted `group[0]`
(duplicate_finder.py:246-248,309).

Everything is JVM-side window/aggregate built-ins (no Python UDFs) and
SQL-parity-able, so the DuckDB oracle verifies value-for-value:
- millisecond epoch via ``unix_millis`` == DuckDB ``epoch_ms`` (both
  truncate microseconds);
- money-ish sums as DECIMAL(18,2) — exact, order-independent — never
  float sums, which differ across shuffle orders.

Scale notes (100 TB): sessionize shuffles once on user_id (the window
partition key); hot users are bounded by per-user event counts, not
corpus size. hourly_rollup is a partial-aggregable groupBy — map-side
combine means the shuffle carries one row per (hour, type) per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """Assign gap-based session ids per user.

    A new session starts when the gap to the previous event of the same
    user exceeds ``gap_minutes``. → input columns + (ts_ms, session_id);
    session_id is 1-based per user, deterministic (ordered by ts with
    id tie-break).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # epoch millis without timezone semantics: diff from an epoch literal
    # cast to the column's own timestamp flavor (NTZ or LTZ), so parquet
    # TIMESTAMP_NTZ matches DuckDB's epoch_ms exactly
    epoch = F.lit("1970-01-01 00:00:00").cast(
        events.schema[ts_col].dataType.simpleString())
    ms = F.timestamp_diff("MILLISECOND", epoch, F.col(ts_col))
    prev = F.lag(ms).over(w)
    new_sess = (prev.isNull()
                | ((ms - prev) > gap_minutes * 60_000)).cast("long")
    cum = Window.partitionBy(user_col).orderBy(ts_col, id_col) \
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (events
            .withColumn("ts_ms", ms)
            .withColumn("_new", new_sess)
            .withColumn("session_id", F.sum("_new").over(cum))
            .drop("_new"))


def session_stats(events: DataFrame, gap_minutes: int = 30,
                  user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id") -> DataFrame:
    """→ (user_id, session_id, n_events, duration_ms): one row per
    gap-delimited session."""
    s = sessionize(events, gap_minutes, user_col, ts_col, id_col)
    return (s.groupBy(user_col, "session_id")
            .agg(F.count("*").alias("n_events"),
                 (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms")))


def hourly_rollup(events: DataFrame, ts_col: str = "ts",
                  type_col: str = "event_type",
                  value_col: str = "value") -> DataFrame:
    """→ (hour, event_type, n_events, sum_value, avg_value): tumbling
    1-hour rollup. DECIMAL sum for cross-engine exactness."""
    dec = F.col(value_col).cast("decimal(18,2)")
    return (events
            .groupBy(F.date_trunc("hour", F.col(ts_col)).alias("hour"),
                     F.col(type_col).alias("event_type"))
            .agg(F.count("*").alias("n_events"),
                 F.sum(dec).cast("double").alias("sum_value"),
                 # double division (not decimal): Spark and DuckDB round
                 # decimal quotients at different scales; IEEE division
                 # of the exact decimal sum is bit-identical in both
                 F.round(F.sum(dec).cast("double") / F.count("*"), 6)
                  .alias("avg_value")))


def rollup_by_type_hour(events: DataFrame, ts_col: str = "ts",
                        type_col: str = "event_type",
                        value_col: str = "value") -> DataFrame:
    """GROUP BY ROLLUP (event_type, hour): per-(type,hour) rows plus
    per-type subtotals plus the grand total, one aggregation pass.

    → (event_type, hour, lvl_type, lvl_hour, n_events, sum_value) where
    lvl_* are the GROUPING() flags (1 = rolled up / NULL-means-total).
    Spark computes rollups as a single expand+aggregate — no second scan
    for the subtotal rows, which is the point at 100 TB.
    """
    base = events.select(
        F.col(type_col).alias("event_type"),
        F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        F.col(value_col).cast("decimal(18,2)").alias("_v"))
    return (base
            .rollup("event_type", "hour")
            .agg(F.grouping("event_type").cast("long").alias("lvl_type"),
                 F.grouping("hour").cast("long").alias("lvl_hour"),
                 F.count("*").alias("n_events"),
                 F.sum("_v").cast("double").alias("sum_value"))
            .select("event_type", "hour", "lvl_type", "lvl_hour",
                    "n_events", "sum_value"))


def event_gaps(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id") -> DataFrame:
    """Per-user inter-event gap via lag: → (user_id, event_id, gap_ms)
    for every event with a predecessor (first event per user excluded —
    its gap is undefined, and NULL semantics differ across engines).

    One shuffle on user_id; deterministic ordering (ts, event_id)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    epoch = F.lit("1970-01-01 00:00:00").cast(
        events.schema[ts_col].dataType.simpleString())
    ms = F.timestamp_diff("MILLISECOND", epoch, F.col(ts_col))
    prev = F.lag(ms).over(w)
    return (events
            .select(user_col, id_col, (ms - prev).alias("gap_ms"))
            .filter(F.col("gap_ms").isNotNull()))


def duplicate_events(events: DataFrame,
                     key_cols: tuple[str, ...] = ("user_id", "event_type",
                                                  "value"),
                     id_col: str = "event_id") -> DataFrame:
    """Exact event dedup: groups with >1 identical (key_cols) rows.

    → (key_cols…, n_dups, kept_event_id): keep-first by min id — the
    reference's deterministic rank-1 keep (duplicate_finder.py:309)
    re-expressed as an aggregate instead of a window, so the shuffle
    carries pre-combined partial aggregates.
    """
    return (events.groupBy(*key_cols)
            .agg(F.count("*").alias("n_dups"),
                 F.min(id_col).alias("kept_event_id"))
            .filter(F.col("n_dups") > 1))
