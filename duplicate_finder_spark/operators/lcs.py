"""Longest-common-substring verify for candidate pairs (suffix-array
pass of the north rule).

The reference's verify stage byte-compares whole files within a hash
group (duplicate_finder.py:427-463; utils.py:89-117). For *containment*
duplicates — one page quoted or mirrored inside another — whole-value
equality is useless; the generalized verify measures the longest run of
characters two documents share. Candidate pairs come from
operators/substring.py (winnowed fingerprints); this pass computes the
exact LCS length per surviving pair so downstream policy can threshold
on absolute/relative overlap before emitting edges.

Algorithm: per pair, binary search on the answer length L; at each L,
compare the two documents' L-gram sets via a polynomial rolling hash
over uint64 (mod 2^64 by natural overflow), fully vectorized in numpy —
O((n+m) log min(n,m)) with no per-char Python loop (a prefix-doubling
suffix array + Kasai LCP is the textbook O(n) alternative, but Kasai's
amortized scan is a per-char Python loop — orders slower under Arrow
batching than vectorized hashing). Every positive hash hit is confirmed
by a real substring comparison, so hash collisions cannot inflate the
answer.

Distribution: pairs stream through ``mapInPandas`` in Arrow batches —
per-pair work is independent, so parallelism is just partitioning of
the pairs DataFrame; no shuffle inside the operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

_P = np.uint64(1099511628211)  # FNV prime — odd ⇒ invertible mod 2^64


def _codes(s: str) -> np.ndarray:
    """Unicode code points as uint64 (exact, locale-free)."""
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) \
             .astype(np.uint64)


def _window_hashes(c: np.ndarray, L: int, pw: np.ndarray) -> np.ndarray:
    """Rolling polynomial hashes of every length-L window of ``c``.

    h[i] = Σ_j c[i+j] · P^j  (mod 2^64), via prefix sums:
    pre[i] = Σ_{t<i} c[t] · P^t ; h[i] = (pre[i+L] − pre[i]) · P^(−i).
    P is odd ⇒ invertible mod 2^64, so the P^(−i) normalization makes
    window hashes position-independent and comparable across documents.
    """
    n = len(c)
    m = n - L + 1
    scaled = c * pw[:n]                      # c[t] · P^t
    pre = np.concatenate(([np.uint64(0)], np.cumsum(scaled,
                                                    dtype=np.uint64)))
    diff = pre[L:] - pre[:-L]                # Σ c[i..i+L) · P^t, t∈[i,i+L)
    return diff * _PINV_POWS(m)              # normalize by P^(−i)


_pinv = pow(int(_P), -1, 1 << 64)


def _PINV_POWS(m: int) -> np.ndarray:
    out = np.empty(m, dtype=np.uint64)
    out[0] = np.uint64(1)
    if m > 1:
        np.multiply.accumulate(
            np.full(m - 1, np.uint64(_pinv), dtype=np.uint64),
            out=out[1:])
    return out


def _pows(n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    out[0] = np.uint64(1)
    if n > 1:
        np.multiply.accumulate(np.full(n - 1, _P, dtype=np.uint64),
                               out=out[1:])
    return out


def _common_at(a: np.ndarray, b: np.ndarray, L: int, pw: np.ndarray,
               sa: str, sb: str) -> bool:
    """True iff some length-L substring occurs in both (hash + confirm)."""
    ha = _window_hashes(a, L, pw)
    hb = _window_hashes(b, L, pw)
    common, ia, ib = np.intersect1d(ha, hb, return_indices=True)
    if len(common) == 0:
        return False
    # confirm against collisions: check each claimed match literally
    for i, j in zip(ia, ib):
        if sa[i:i + L] == sb[j:j + L]:
            return True
    return False


def lcs_len(sa: str, sb: str) -> int:
    """Exact longest-common-substring length of two strings."""
    if not sa or not sb:
        return 0
    a, b = _codes(sa), _codes(sb)
    lo, hi = 0, min(len(a), len(b))          # invariant: common at lo
    pw = _pows(max(len(a), len(b)))
    if not _common_at(a, b, 1, pw, sa, sb):
        return 0
    lo = 1
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if _common_at(a, b, mid, pw, sa, sb):
            lo = mid
        else:
            hi = mid - 1
    return lo


_SCHEMA = StructType([
    StructField("url_a", StringType()),
    StructField("url_b", StringType()),
    StructField("lcs_len", LongType()),
])


def lcs_verify(pairs: DataFrame, docs: DataFrame,
               url_col: str = "url", text_col: str = "text",
               a_col: str = "url_a", b_col: str = "url_b") -> DataFrame:
    """→ (url_a, url_b, lcs_len) for each candidate pair.

    ``pairs`` carries id pairs; texts are joined in (broadcast-or-shuffle
    chosen by AQE on actual sizes) and the kernel runs in Arrow batches.
    """
    t_a = docs.select(F.col(url_col).cast("string").alias(a_col),
                      F.col(text_col).alias("_ta"))
    t_b = docs.select(F.col(url_col).cast("string").alias(b_col),
                      F.col(text_col).alias("_tb"))
    joined = (pairs.select(F.col(a_col).cast("string").alias(a_col),
                           F.col(b_col).cast("string").alias(b_col))
              .join(t_a, a_col).join(t_b, b_col)
              .select(a_col, b_col, "_ta", "_tb"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "url_a": pdf[a_col],
                "url_b": pdf[b_col],
                "lcs_len": [lcs_len(x, y)
                            for x, y in zip(pdf["_ta"], pdf["_tb"])],
            })

    return joined.mapInPandas(kernel, _SCHEMA)
