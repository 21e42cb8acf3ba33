"""Incremental near-duplicate detection for a continuous crawl.

``streaming/dedup.py`` dedups EXACT content hashes in-flight; this
module closes the near-dup gap (VERDICT r2 #6): pages arriving as a
stream (e.g. new WARC segments, sources/warc.py) are MinHash-signed per
micro-batch and LSH-paired against a bounded signature store, so a page
that nearly duplicates one seen yesterday is caught without re-running
the batch pipeline over the whole corpus.

Shape: ``foreachBatch`` — the standard Structured Streaming pattern for
incremental jobs whose per-batch logic needs the full batch API. Each
micro-batch:

1. signs the new pages (operators/minhash.py — identical config and
   code path as the batch engine, so verification semantics are
   bit-identical, not a streaming approximation);
2. generates candidates from band-hash collisions of NEW pages against
   (store ∪ new) — old×old pairs are never recomputed; hot buckets
   degrade to star edges exactly like the batch path
   (operators/lsh.py:37-59);
3. verifies with the same sketch-bounded ``verify_pairs`` and appends
   only previously-unseen edges;
4. appends the new signatures to the store.

State is a parquet directory (signatures + edges), NOT the opaque
streaming state store: it is resumable, inspectable, and reliable
across executor loss — the same argument as the warehouse round tables
in operators/components.py. The store is bounded by ``watermark``: a
stored signature older than (max event time seen − watermark) is
ignored at read and physically dropped by periodic compaction, so
state grows with arrival rate × watermark, not corpus size. A pair
whose members arrive further apart than the watermark is out of
contract (same late-data semantics as dropDuplicatesWithinWatermark).

Exactly-once: foreachBatch re-runs a micro-batch after failure;
re-appending is harmless because edges are de-duplicated both at
append (left_anti against existing) and at read (distinct), and
re-appended signatures are distinct()-ed at read.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duplicate_finder_spark.config import PipelineConfig
from duplicate_finder_spark.operators.lsh import band_hashes, verify_pairs
from duplicate_finder_spark.operators.minhash import signatures

_SIG_SCHEMA = ("url string, ts timestamp, shingles array<long>, "
               "minhash array<long>, n_shingles int, sketch array<long>, "
               "n_tokens int")
_EDGE_SCHEMA = "url_a string, url_b string, jaccard double"


class StreamingNearDup:
    """foreachBatch processor maintaining (signatures, edges) state dirs.

    Usage::

        snd = StreamingNearDup(spark, cfg, store_dir, watermark_minutes=60)
        q = (pages_stream.writeStream.foreachBatch(snd.process_batch)
             .trigger(availableNow=True)
             .option("checkpointLocation", ckpt).start())
        q.awaitTermination()
        edges = snd.edges()          # verified near-dup pair set so far
    """

    def __init__(self, spark: SparkSession, cfg: PipelineConfig,
                 store_dir: str, ts_col: str = "warc_ts",
                 watermark_minutes: int = 60,
                 compact_every: int = 16) -> None:
        self.spark = spark
        self.cfg = cfg
        self.ts_col = ts_col
        self.watermark_minutes = watermark_minutes
        self.compact_every = compact_every
        self.sig_dir = os.path.join(store_dir, "signatures")
        self.edge_dir = os.path.join(store_dir, "edges")

    # -- state readers ------------------------------------------------------

    def _read_or_empty(self, path: str, schema: str) -> DataFrame:
        # only the MISSING-dir case means "first batch, no state yet" —
        # a transient I/O error or corrupt parquet must propagate, not
        # silently masquerade as an empty store (which would drop
        # cross-batch pairs and re-append already-emitted edges)
        if not os.path.exists(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(path)

    def stored_signatures(self) -> DataFrame:
        return self._read_or_empty(self.sig_dir, _SIG_SCHEMA).distinct()

    def edges(self) -> DataFrame:
        """→ (url_a, url_b, jaccard): all verified near-dup edges."""
        return self._read_or_empty(self.edge_dir, _EDGE_SCHEMA).distinct()

    # -- the micro-batch ----------------------------------------------------

    def _live_store(self, new_max_ts) -> DataFrame:
        """Stored signatures still inside the watermark window."""
        store = self.stored_signatures()
        if new_max_ts is None:
            return store
        horizon = F.lit(new_max_ts) - F.expr(
            f"INTERVAL {self.watermark_minutes} MINUTES")
        return store.filter(F.col("ts") >= horizon)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        cfg = self.cfg
        rows = batch.select(
            "url", F.col(self.ts_col).alias("ts"), "text")
        if rows.isEmpty():
            return
        new_max_ts = rows.agg(F.max("ts")).first()[0]

        sigs_new = (signatures(rows, cfg)
                    .join(rows.select("url", "ts"), "url")
                    .select("url", "ts", "shingles", "minhash",
                            F.col("n_shingles").cast("int").alias(
                                "n_shingles"), "sketch",
                            F.col("n_tokens").cast("int").alias("n_tokens"))
                    .persist())
        store = self._live_store(new_max_ts)
        sigs_all = sigs_new.unionByName(store)

        pairs = self._incremental_candidates(
            band_hashes(sigs_new, cfg), band_hashes(sigs_all, cfg))
        verified = verify_pairs(pairs, sigs_all, cfg.jaccard_threshold,
                                cfg)
        new_edges = verified.join(self.edges().select("url_a", "url_b"),
                                  ["url_a", "url_b"], "left_anti")
        new_edges.write.mode("append").parquet(self.edge_dir)
        sigs_new.write.mode("append").parquet(self.sig_dir)
        sigs_new.unpersist()

        if self.compact_every and (batch_id + 1) % self.compact_every == 0:
            self._compact(new_max_ts)

    def _incremental_candidates(self, bands_new: DataFrame,
                                bands_all: DataFrame) -> DataFrame:
        """(new ⋈ all) band-collision pairs, url_a < url_b — old×old
        pairs were emitted when THEIR newer member arrived, so they are
        never recomputed. Hot buckets (sized over the FULL live bucket,
        so boilerplate accumulating across batches still trips the cap)
        emit O(s) star edges to the bucket's min-url representative,
        mirroring the batch path."""
        w = Window.partitionBy("band", "band_hash")
        all_sized = (bands_all
                     .withColumn("bucket_size", F.count("*").over(w))
                     .withColumn("bucket_rep", F.min("url").over(w)))
        new_keys = bands_new.select("band", "band_hash", "url")

        small = all_sized.filter(
            F.col("bucket_size") <= self.cfg.hot_bucket_limit)
        hot = all_sized.filter(
            F.col("bucket_size") > self.cfg.hot_bucket_limit)

        pairs_small = (new_keys
                       .join(small.select(
                           "band", "band_hash",
                           F.col("url").alias("other")),
                           ["band", "band_hash"])
                       .filter(F.col("url") != F.col("other"))
                       .select(F.least("url", "other").alias("url_a"),
                               F.greatest("url", "other").alias("url_b")))
        # star edges: only for NEW members of hot buckets (old members
        # got their rep edge on arrival)
        pairs_hot = (new_keys
                     .join(hot.select("band", "band_hash", "bucket_rep")
                           .distinct(), ["band", "band_hash"])
                     .filter(F.col("url") != F.col("bucket_rep"))
                     .select(F.least("url", "bucket_rep").alias("url_a"),
                             F.greatest("url", "bucket_rep").alias("url_b")))
        return pairs_small.unionByName(pairs_hot).distinct()

    def _compact(self, new_max_ts) -> None:
        """Physically drop expired signatures and rewrite both state dirs
        distinct — bounds disk, not just the working set."""
        live = self._live_store(new_max_ts).persist()
        live.count()
        edges = self.edges().persist()
        edges.count()
        live.write.mode("overwrite").parquet(self.sig_dir + "_tmp")
        self.spark.read.parquet(self.sig_dir + "_tmp") \
            .write.mode("overwrite").parquet(self.sig_dir)
        edges.write.mode("overwrite").parquet(self.edge_dir + "_tmp")
        self.spark.read.parquet(self.edge_dir + "_tmp") \
            .write.mode("overwrite").parquet(self.edge_dir)
        live.unpersist()
        shutil.rmtree(self.sig_dir + "_tmp", ignore_errors=True)
        shutil.rmtree(self.edge_dir + "_tmp", ignore_errors=True)
        edges.unpersist()


def streaming_near_dup(pages_stream: DataFrame, processor: StreamingNearDup,
                       checkpoint_dir: str):
    """Wire a pages stream (url, warc_ts, text, …) through the
    processor; returns the started query. Use trigger(availableNow) to
    drain a backlog, or the default micro-batch trigger for a live
    crawl."""
    return (pages_stream.writeStream
            .foreachBatch(processor.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
