"""Broadcast Bloom-filter membership prefilter for incremental dedup.

The cross-snapshot workflow (operators/crosssnap.py) starts every batch
with a re-crawl probe: which new urls already exist in the kept corpus?
As an equi-join that is correct but costs a shuffle whose big side is
the 10^12-row STORE. A Bloom filter over the store's urls inverts the
cost: the batch probes a broadcast bitmap (no false NEGATIVES, tunable
false-positive rate), and only the tiny maybe-positive slice ever joins
the store — the store is never shuffled for the probe at all.

Spark-first construction — every stage is a built-in:

* build: k bit positions per key are JVM expressions
  (``pmod(xxhash64(key, lit(i)), m)``), folded into 64-bit words by one
  map-side-combinable ``groupBy(word_idx).agg(bit_or(shiftleft(...)))``
  — the shuffle carries AT MOST ``m/64`` rows total (the bitmap's set
  words), regardless of corpus size, and is append-mergeable: the word
  rows of a new batch OR into the store's rows, so the filter is
  maintained incrementally as a warehouse table, never rebuilt.
* probe: positions are precomputed by the same JVM expressions; one
  Arrow-vectorized pandas UDF tests them against the broadcast numpy
  bitmap (int64 loads + shifts, no Python loop).

Sizing: ``bloom_params(n, fpp)`` gives the textbook optimum
m = -n·ln(p)/ln(2)², k = (m/n)·ln(2) (Bloom 1970). The dense bitmap is
``m/64`` int64s on the driver/executors — size it like any broadcast
(1e9 keys @ 1% fpp ≈ 1.2 GiB: at that scale shard the filter by
``pmod(xxhash64(key), shards)`` and probe per-shard; below ~1e8 keys a
single broadcast is the right call).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def bloom_params(n_expected: int, fpp: float = 0.01) -> tuple[int, int]:
    """→ (m_bits, k_hashes), m rounded up to a multiple of 64."""
    if n_expected < 1:
        raise ValueError(f"n_expected must be >= 1, got {n_expected}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = -n_expected * math.log(fpp) / (math.log(2) ** 2)
    m_bits = max(64, (int(math.ceil(m)) + 63) // 64 * 64)
    k = max(1, round(m_bits / n_expected * math.log(2)))
    return m_bits, k


def _positions(col: str, m_bits: int, k: int) -> list:
    """k seeded bit positions, all JVM expressions."""
    return [F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m_bits))
            for i in range(k)]


def bloom_words(df: DataFrame, col: str, m_bits: int, k: int) -> DataFrame:
    """→ (word_idx long, word long): the bitmap's SET words, sparse.

    This is the distributed (and warehouse-storable) representation;
    rows from successive batches merge by the same aggregation, so an
    append-only store keeps per-batch word tables and the probe (or a
    compaction) folds them with one more ``bit_or``.
    """
    pos = F.explode(F.array(*_positions(col, m_bits, k))).alias("pos")
    return (df.select(pos)
            .select(F.shiftright("pos", 6).alias("word_idx"),
                    # pyspark's shiftleft() only takes a literal shift;
                    # the SQL form accepts the column
                    F.expr("shiftleft(1L, cast(pos & 63 as int))")
                     .alias("bit"))
            .groupBy("word_idx")
            .agg(F.bit_or("bit").alias("word")))


def merge_bloom_words(*word_tables: DataFrame) -> DataFrame:
    """OR several word tables (e.g. per-batch appends) into one."""
    it = iter(word_tables)
    acc = next(it)
    for t in it:
        acc = acc.unionByName(t)
    return acc.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


@dataclass(frozen=True)
class BloomFilter:
    """Dense driver-side bitmap + params; build once, probe many."""
    words: np.ndarray  # int64, length m_bits // 64
    m_bits: int
    k: int

    @classmethod
    def build(cls, df: DataFrame, col: str, n_expected: int,
              fpp: float = 0.01) -> "BloomFilter":
        m_bits, k = bloom_params(n_expected, fpp)
        return cls.from_words(bloom_words(df, col, m_bits, k), m_bits, k)

    @classmethod
    def from_words(cls, words_df: DataFrame, m_bits: int,
                   k: int) -> "BloomFilter":
        dense = np.zeros(m_bits // 64, dtype=np.int64)
        # bounded collect: ≤ m/64 rows by construction
        pdf = words_df.toPandas()
        if len(pdf):
            dense[pdf["word_idx"].to_numpy()] = pdf["word"].to_numpy()
        return cls(words=dense, m_bits=m_bits, k=k)

    def maybe_contains(self, df: DataFrame, col: str,
                       out_col: str = "bloom_maybe") -> DataFrame:
        """df + boolean ``out_col``; False ⇒ DEFINITELY not a member."""
        spark = SparkSession.getActiveSession()
        bc = spark.sparkContext.broadcast(self.words)

        @pandas_udf("boolean")
        def _probe(*pos_cols: pd.Series) -> pd.Series:
            bm = bc.value
            maybe = None
            for s in pos_cols:
                p = s.to_numpy(dtype=np.int64)
                hit = (bm[p >> 6] >> (p & 63)) & 1
                maybe = hit if maybe is None else (maybe & hit)
            return pd.Series(maybe.astype(bool))

        return df.withColumn(
            out_col, _probe(*_positions(col, self.m_bits, self.k)))


def split_by_membership(batch: DataFrame, store_keys: DataFrame,
                        bloom: BloomFilter, col: str
                        ) -> tuple[DataFrame, DataFrame]:
    """→ (in_store, not_in_store) — EXACT split, bloom-accelerated.

    Bloom negatives skip the join entirely (no false negatives ⇒ they
    are definitely new); only the maybe-positive slice — true members
    plus ~fpp of the rest — does the exact semi/anti join against the
    store's keys, so the join's probe side shrinks from |batch| to
    ≈ |overlap| + fpp·|batch| and can often broadcast.
    """
    probed = bloom.maybe_contains(batch, col)
    negatives = probed.filter(~F.col("bloom_maybe")).drop("bloom_maybe")
    maybes = probed.filter(F.col("bloom_maybe")).drop("bloom_maybe")
    in_store = maybes.join(store_keys, col, "left_semi")
    fp = maybes.join(store_keys, col, "left_anti")
    return in_store, negatives.unionByName(fp)
