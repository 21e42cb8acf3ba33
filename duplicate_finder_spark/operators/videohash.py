"""Video near-duplicate detection: frame-hash set overlap.

A video is near-duplicate of another when most of their FRAMES are
near-duplicates — re-muxed, trimmed, or re-encoded copies share almost
all perceptual frame hashes. This composes the engine's existing
pieces end-to-end:

1. frame extraction — the real RIFF/AVI container walk
   (operators/avicodec.py::parse_avi_frames) with even sampling;
2. per-frame perceptual hash — operators/imagehash.py::ahash64 over
   the real image decoders; extraction, decode, and hashing are FUSED
   into one Arrow pass so frame bytes never leave the scan stage —
   only (video, frame_no, 8-byte hash) rows come out;
3. pair mining — set Jaccard over per-video DISTINCT frame hashes via
   an inverted index on the hash value (the operators/jaccard.py
   shape): group by hash, emit co-occurring video pairs, count shared,
   Jaccard = shared / (|A| + |B| − shared).

Skew: a ubiquitous frame hash (black frames, title cards) is the hot
token of this index — ``max_hash_df`` drops hashes appearing in more
than that many videos from the SHARED count (set sizes keep them), the
df-cut contract of operators/jaccard.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duplicate_finder_spark.operators.imagehash import ahash64
from duplicate_finder_spark.operators.multimodal import decode_image

__all__ = ["video_frame_hashes", "video_neardup_pairs"]

FRAME_HASH_SCHEMA = "doc_id long, frame_no int, ahash long"


def video_frame_hashes(df: DataFrame, max_frames: int = 16,
                       id_col: str = "doc_id",
                       bin_col: str = "payload") -> DataFrame:
    """(id, binary AVI) → (doc_id, frame_no, ahash), up to
    ``max_frames`` evenly-sampled frames per video; frames no image
    decoder accepts are skipped (F6 semantics)."""
    from duplicate_finder_spark.operators.avicodec import (
        parse_avi_frames, sample_indices)
    id_name, bin_name = id_col, bin_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, hashes = [], [], []
            for i, b in zip(pdf[id_name], pdf[bin_name]):
                if b is None:
                    continue
                frames = parse_avi_frames(bytes(b))
                if not frames:
                    continue
                for fno in sample_indices(len(frames), max_frames):
                    img = decode_image(frames[fno])
                    if img is None or min(img.shape[:2]) < 8:
                        continue
                    ids.append(int(i))
                    nos.append(fno)
                    hashes.append(ahash64(img))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_no": pd.Series(nos, dtype="int32"),
                "ahash": pd.Series(hashes, dtype="int64")})

    return df.select(id_col, bin_col).mapInPandas(run, FRAME_HASH_SCHEMA)


def video_neardup_pairs(frame_hashes: DataFrame,
                        min_jaccard: float = 0.5,
                        max_hash_df: int = 1000,
                        id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id_a, doc_id_b, n_shared, jaccard ≥ min_jaccard) over
    per-video DISTINCT frame-hash sets.

    One inverted-index self-join on the 8-byte hash (videos sharing no
    frame hash never meet); hashes in more than ``max_hash_df`` videos
    are excluded from the shared count (they still count toward set
    sizes), bounding any hash bucket's fan-out at O(max_hash_df²) the
    way the n-gram index bounds hot tokens.

    Plan shape (r6): per-video distinct hash sets come from ONE
    map-side-combined ``collect_set`` exchange on the video id (sets are
    bounded by frames-per-video, so no skew risk), carrying the set
    size through the explode like the n-gram index — the frame-hash
    subtree (container walk + decode + hash Python pass) has a single
    consumer and executes exactly once, the df-cut is a window count on
    the hash exchange that both self-join sides reuse, and no sizes
    table is ever joined back. Three exchanges total, down from a
    distinct + two groupBys + three join-backs.
    """
    sets = (frame_hashes.groupBy(id_col)
            .agg(F.collect_set("ahash").alias("_hs")))
    fh = sets.select(id_col, F.size("_hs").alias("n"),
                     F.explode("_hs").alias("ahash"))
    w = Window.partitionBy("ahash")
    fhr = (fh.withColumn("_df", F.count("*").over(w))
           .filter(F.col("_df") <= max_hash_df)
           .drop("_df"))
    a = fhr.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"),
                   "ahash")
    b = fhr.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"),
                   "ahash")
    shared = (a.join(b, "ahash")
              .filter(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b", "na", "nb")
              .agg(F.count("*").alias("n_shared")))
    return (shared
            .withColumn("jaccard", F.round(
                F.col("n_shared")
                / (F.col("na") + F.col("nb") - F.col("n_shared")), 6))
            .filter(F.col("jaccard") >= min_jaccard)
            .select(F.col("id_a").alias(f"{id_col}_a"),
                    F.col("id_b").alias(f"{id_col}_b"),
                    "n_shared", "jaccard"))
