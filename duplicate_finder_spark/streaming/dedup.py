"""Structured Streaming ingest + exact dedup.

The reference is a one-shot batch program (SURVEY.md §2.10); the batch
engine keeps that shape. This module is the *continuous-crawl* variant a
web-scale deployment needs: pages arriving as files (or any streaming
source) are content-hashed and deduplicated incrementally, with a
watermark bounding the dedup state so it doesn't grow with the corpus.

Semantics mirror the batch exact stage (operators/exact.py):
- identity hash = sha2(text, 256), byte-exact vs the reference's
  hashlib digest (utils.py:10-16);
- "first seen wins" ≙ the reference's keep-rank-1 rule
  (duplicate_finder.py:309), here in arrival order (the only order a
  stream has).

Scale notes: ``dropDuplicatesWithinWatermark`` keeps per-key state in
the state store, partitioned by the hash — uniform by construction, so
no skew; the watermark expires state, so memory is bounded by the
arrival rate × watermark window, not by total corpus size. Hourly
volume rollups use a tumbling event-time window with late-data
tolerance from the same watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_pages_stream(spark: SparkSession, path: str, schema: StructType,
                      fmt: str = "parquet",
                      max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a directory of page files."""
    return (spark.readStream.format(fmt)
            .schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .load(path))


def streaming_exact_dedup(pages: DataFrame, ts_col: str = "warc_ts",
                          text_col: str = "text",
                          watermark: str = "10 minutes") -> DataFrame:
    """First-seen-wins exact dedup on content hash, state bounded by
    ``watermark`` of event time. → input columns + content_hash."""
    hashed = pages.withColumn(
        "content_hash", F.sha2(F.col(text_col).cast("binary"), 256))
    return (hashed
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_hash"]))


def streaming_dup_counts(pages: DataFrame, ts_col: str = "warc_ts",
                         text_col: str = "text",
                         watermark: str = "10 minutes",
                         window: str = "1 hour") -> DataFrame:
    """Tumbling event-time rollup of duplicate volume per content hash:
    → (window, content_hash, n_copies). Append-mode-capable (watermarked
    windowed agg); downstream can filter n_copies > 1 for dup groups,
    the streaming analogue of HAVING count>1 (duplicate_finder.py:246-250).
    """
    hashed = pages.withColumn(
        "content_hash", F.sha2(F.col(text_col).cast("binary"), 256))
    return (hashed
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window), "content_hash")
            .agg(F.count("*").alias("n_copies")))


def run_stream_to_memory(df: DataFrame, name: str,
                         output_mode: str = "append"):
    """Drain all available input into an in-memory table (tests/demos);
    returns the started query after it has processed everything."""
    q = (df.writeStream.format("memory")
         .queryName(name)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
