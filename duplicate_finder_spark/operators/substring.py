"""Substring-containment dedup: find docs embedded verbatim inside longer
docs (quotes, scraped mirrors, aggregation pages) — pairs that MinHash
misses because whole-doc Jaccard is low (inner/outer size ratio).

Method: winnowing fingerprints (Schleimer-Wilkerson-Aiken, SIGMOD'03 —
the MOSS algorithm) over positional word-k-gram hashes, vectorized in an
Arrow UDF; then the same inverted-index pairing as operators/jaccard.py
but scored by CONTAINMENT |A∩B| / min(|A|,|B|) instead of Jaccard; then
an exact verify: the shorter text must literally occur inside the longer
(JVM-side ``contains`` on the candidate pairs only).

Winnowing guarantee: any shared run of ≥ window+k-1 tokens shares at
least one fingerprint, so a fully-embedded doc shares nearly all of its
fingerprints with its container — containment ≈ 1 up to boundary noise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from duplicate_finder_spark.functions.text import tokens
from duplicate_finder_spark.operators.minhash import shingle_hashes_np


def _winnow(seq: np.ndarray, window: int) -> np.ndarray:
    """Distinct minima of each sliding window (uint64)."""
    if len(seq) == 0:
        return seq
    if len(seq) <= window:
        return np.unique(seq.min(keepdims=True))
    sw = np.lib.stride_tricks.sliding_window_view(seq, window)
    return np.unique(sw.min(axis=1))


def make_fingerprint_udf(k: int, window: int):
    @F.pandas_udf(ArrayType(LongType()))
    def fingerprints(tok_hashes: pd.Series) -> pd.Series:
        out = []
        for row in tok_hashes:
            if row is None or len(row) == 0:
                out.append(None)
                continue
            toks = np.asarray(row, dtype=np.int64).view(np.uint64)
            # positional shingle hashes (duplicates kept — order matters)
            n = len(toks)
            if n < k:
                sh = shingle_hashes_np(toks, k)
            else:
                m = n - k + 1
                w = np.lib.stride_tricks.sliding_window_view(toks, k)
                # same mixing as shingle_hashes_np but positional
                from duplicate_finder_spark.operators.minhash import (
                    _POS_MIX_SEED, _pos_weights)
                pw = _pos_weights(k)
                acc = np.full(m, np.uint64(_POS_MIX_SEED), dtype=np.uint64)
                for j in range(k):
                    acc = acc * pw[j] + w[:, j]
                sh = acc
            out.append(_winnow(sh, window).view(np.int64))
        return pd.Series(out)

    return fingerprints


def fingerprint_docs(docs: DataFrame, k: int = 3, window: int = 4,
                     url_col: str = "url",
                     text_col: str = "text") -> DataFrame:
    """→ (url, fps array<long>, n_fp)."""
    tok_hashes = F.transform(tokens(text_col), lambda t: F.xxhash64(t))
    fp = make_fingerprint_udf(k, window)
    return (docs.select(F.col(url_col).alias("url"),
                        tok_hashes.alias("_th"),
                        F.length(text_col).alias("text_len"))
            .filter(F.size("_th") > 0)
            .withColumn("fps", fp("_th"))
            .select("url", "text_len", "fps",
                    F.size("fps").alias("n_fp")))


def containment_pairs(docs: DataFrame, k: int = 3, window: int = 4,
                      min_containment: float = 0.7,
                      min_fp: int = 3,
                      max_doc_freq: int | None = 1000,
                      url_col: str = "url",
                      text_col: str = "text") -> DataFrame:
    """→ verified (url_inner, url_outer, containment): url_inner's text
    occurs literally inside url_outer's text.

    ``max_doc_freq`` drops boilerplate fingerprints (df-cut) before the
    inverted-index join — explicit skew control, same rationale as
    operators/jaccard.py.
    """
    fps = fingerprint_docs(docs, k, window, url_col, text_col)
    fps = fps.filter(F.col("n_fp") >= min_fp)
    ex = fps.select("url", "text_len", "n_fp", F.explode("fps").alias("f"))
    if max_doc_freq is not None:
        rare = (ex.groupBy("f").count()
                  .filter(F.col("count") <= max_doc_freq).select("f"))
        ex = ex.join(rare, "f", "left_semi")
    a = ex.select(F.col("url").alias("url_a"), F.col("n_fp").alias("na"),
                  F.col("text_len").alias("len_a"), "f")
    b = ex.select(F.col("url").alias("url_b"), F.col("n_fp").alias("nb"),
                  F.col("text_len").alias("len_b"), "f")
    inter = (a.join(b, "f")
             .filter(F.col("url_a") < F.col("url_b"))
             .groupBy("url_a", "url_b", "na", "nb", "len_a", "len_b")
             .agg(F.count("*").alias("c")))
    cand = (inter
            .withColumn("containment",
                        F.col("c") / F.least("na", "nb"))
            .filter(F.col("containment") >= min_containment)
            # orient: inner = shorter text
            .select(
                F.when(F.col("len_a") <= F.col("len_b"), F.col("url_a"))
                 .otherwise(F.col("url_b")).alias("url_inner"),
                F.when(F.col("len_a") <= F.col("len_b"), F.col("url_b"))
                 .otherwise(F.col("url_a")).alias("url_outer"),
                "containment"))
    # exact verify on candidates only (V1' for containment)
    inner_t = docs.select(F.col(url_col).alias("url_inner"),
                          F.col(text_col).alias("_t_in"))
    outer_t = docs.select(F.col(url_col).alias("url_outer"),
                          F.col(text_col).alias("_t_out"))
    return (cand.join(inner_t, "url_inner").join(outer_t, "url_outer")
            .filter(F.expr("instr(_t_out, _t_in) > 0"))
            .select("url_inner", "url_outer", "containment"))
