"""Perceptual image near-duplicate detection (aHash + block join).

Text near-dup has MinHash/SimHash; a multimodal training pipeline needs
the same operation over its image columns: re-encoded, resized, or
re-compressed copies of one image should land in one cluster even
though their bytes (and so their sha256) differ. The standard cheap
signal is the AVERAGE HASH (aHash): downsample the decoded image to an
8×8 grayscale grid and emit one bit per cell — above or below the
global mean. Near-duplicate images differ in a few bits; Hamming
distance does the rest.

This module composes two pieces the engine already has:

* the REAL decoders (operators/multimodal.py::decode_image — PPM, BMP,
  PNG, GIF, JPEG baseline+progressive) feed an Arrow-batched
  ``mapInPandas`` that emits one 64-bit hash per image — numpy
  integer arithmetic only, engine-exact (no float means: a cell bit is
  ``cell_sum * n_pixels >= total_sum * cell_pixels``, all integers);
* pairing IS ``operators/simhash.py::simhash_pairs`` — the Manku-style
  pigeonhole block join with hot-block star+chain degradation. One
  64-bit fingerprint column is one 64-bit fingerprint column; the
  text and image paths share the exact same skew-safe plan.

Scale shape (10^9 images): decode+hash is embarrassingly parallel
(one Arrow pass, no shuffle); candidate generation shuffles 8-byte
hashes + ids only — pixels never leave the scan stage.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duplicate_finder_spark.config import PipelineConfig
from duplicate_finder_spark.operators.multimodal import decode_image
from duplicate_finder_spark.operators.simhash import simhash_pairs

__all__ = ["ahash64", "image_hashes", "image_neardup_pairs"]

HASH_SCHEMA = "doc_id long, ahash long"


def ahash64(img: np.ndarray, grid: int = 8) -> int:
    """64-bit average hash of an HxWx3 uint8 image, integer-exact.

    Grayscale is the integer RGB sum (no luma weights — keeps every
    step closed-form for oracles); the grid cell (gy, gx) covers rows
    [gy·H//8, (gy+1)·H//8) so any dimensions ≥ 8×8 work. Bit k (MSB
    first, k = gy·8+gx) is set iff
    ``cell_sum * total_pixels >= total_sum * cell_pixels`` — the
    integer form of "cell mean ≥ image mean". Returned as a SIGNED
    64-bit value (two's complement) to match a Spark/DuckDB BIGINT.
    """
    h, w = img.shape[:2]
    if h < grid or w < grid:
        raise ValueError(f"image {h}x{w} smaller than {grid}x{grid}")
    gray = img.astype(np.int64).sum(axis=2)
    total_sum = int(gray.sum())
    total_px = h * w
    ys = [y * h // grid for y in range(grid + 1)]
    xs = [x * w // grid for x in range(grid + 1)]
    out = 0
    for gy in range(grid):
        for gx in range(grid):
            cell = gray[ys[gy]:ys[gy + 1], xs[gx]:xs[gx + 1]]
            bit = int(cell.sum()) * total_px >= total_sum * cell.size
            out = (out << 1) | int(bit)
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def image_hashes(df: DataFrame, id_col: str = "doc_id",
                 bin_col: str = "payload") -> DataFrame:
    """(id, binary) → (doc_id, ahash) for every decodable image; rows
    whose payload no decoder accepts are dropped (F6 semantics — a
    corrupt image must not fail the stage)."""
    id_name, bin_name = id_col, bin_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, b in zip(pdf[id_name], pdf[bin_name]):
                if b is None:
                    continue
                img = decode_image(bytes(b))
                if img is None or min(img.shape[:2]) < 8:
                    continue
                ids.append(int(i))
                hashes.append(ahash64(img))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "ahash": pd.Series(hashes, dtype="int64")})

    return df.select(id_col, bin_col).mapInPandas(run, HASH_SCHEMA)


def image_neardup_pairs(hashes: DataFrame, cfg: PipelineConfig,
                        n_blocks: int = 4,
                        id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id_a, doc_id_b, hamming ≤ cfg.simhash_hamming_max): the
    SimHash Manku block join over image hashes — identical plan,
    recall contract, and hot-block behavior as the text path
    (operators/simhash.py:52)."""
    sims = hashes.select(F.col(id_col).alias("url"),
                         F.col("ahash").alias("simhash"))
    out = simhash_pairs(sims, cfg, n_blocks=n_blocks)
    return out.select(F.col("url_a").alias(f"{id_col}_a"),
                      F.col("url_b").alias(f"{id_col}_b"),
                      "hamming")
