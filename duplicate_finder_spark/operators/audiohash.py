"""Perceptual audio near-duplicate detection (energy fingerprint).

The audio analogue of operators/imagehash.py: re-encoded or slightly
re-processed copies of one recording should cluster even though their
bytes differ. The cheap classic signal is an ENERGY-PROFILE hash:
split the decoded mono signal into 64 equal time windows and emit one
bit per window — mean |amplitude| above or below the whole clip's mean
(the same mean-threshold construction as aHash, over time instead of
space). Near-duplicate audio differs in a few bits; Hamming distance
and the SimHash Manku block join do the rest.

Exactness note: decode_wav returns dyadic-rational float64 samples
((raw−128)/128 and raw/32768 are exact), window populations differ by
at most one sample, and the bit test compares two exact sums — so for
PCM inputs whose window energies sit off the global mean by any
nonzero margin the fingerprint is bit-stable across numpy versions and
engines. The driver oracle exploits this: it rebuilds every bit
closed-form in integer arithmetic.

Scale shape (10^9 clips): decode+hash is one Arrow pass, no shuffle;
candidate generation shuffles 8-byte hashes + ids only — samples never
leave the scan stage. Pairing IS operators/simhash.py::simhash_pairs,
skew contract included.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duplicate_finder_spark.config import PipelineConfig
from duplicate_finder_spark.operators.multimodal import decode_wav
from duplicate_finder_spark.operators.simhash import simhash_pairs

__all__ = ["audio_fingerprint64", "audio_hashes", "audio_neardup_pairs"]

HASH_SCHEMA = "doc_id long, ahash long"


def audio_fingerprint64(samples: np.ndarray, windows: int = 64) -> int:
    """64-bit energy-profile hash of a mono float signal, MSB = first
    window. Bit w is set iff
    ``win_sum · n_samples ≥ total_sum · win_len`` over |amplitude| —
    the cross-multiplied form of "window mean ≥ clip mean", so no
    division happens and dyadic inputs stay exact. Signed 64-bit
    (two's complement) to match a Spark/DuckDB BIGINT."""
    n = samples.size
    if n < windows:
        raise ValueError(f"clip of {n} samples shorter than {windows}")
    mag = np.abs(samples.astype(np.float64))
    total = float(mag.sum())
    bounds = [w * n // windows for w in range(windows + 1)]
    out = 0
    for w in range(windows):
        seg = mag[bounds[w]:bounds[w + 1]]
        bit = float(seg.sum()) * n >= total * seg.size
        out = (out << 1) | int(bit)
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def audio_hashes(df: DataFrame, id_col: str = "doc_id",
                 bin_col: str = "payload") -> DataFrame:
    """(id, binary WAV) → (doc_id, ahash) for every decodable clip of
    ≥ 64 samples; undecodable or too-short rows are dropped (F6
    semantics — one corrupt upload must not fail the stage)."""
    id_name, bin_name = id_col, bin_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, b in zip(pdf[id_name], pdf[bin_name]):
                if b is None:
                    continue
                wav = decode_wav(bytes(b))
                if wav is None or wav[0].size < 64:
                    continue
                ids.append(int(i))
                hashes.append(audio_fingerprint64(wav[0]))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "ahash": pd.Series(hashes, dtype="int64")})

    return df.select(id_col, bin_col).mapInPandas(run, HASH_SCHEMA)


def audio_neardup_pairs(hashes: DataFrame, cfg: PipelineConfig,
                        n_blocks: int = 4,
                        id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id_a, doc_id_b, hamming ≤ cfg.simhash_hamming_max) via
    the SimHash Manku block join — identical plan and hot-block
    behavior as the text and image paths."""
    sims = hashes.select(F.col(id_col).alias("url"),
                         F.col("ahash").alias("simhash"))
    out = simhash_pairs(sims, cfg, n_blocks=n_blocks)
    return out.select(F.col("url_a").alias(f"{id_col}_a"),
                      F.col("url_b").alias(f"{id_col}_b"),
                      "hamming")
