"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns; all Spark-side
mechanics — schema, Arrow batch shape, partition sizing, UDF signatures —
are real and tested. The actual media DECODE is stubbed behind
``decode_stub`` (the codec libraries are not in this container), with a
deterministic fake used in tests so downstream feature logic is
exercisable end-to-end.

Pattern: ``mapInPandas`` (iterator of pandas batches) so one task
processes many Arrow batches without per-row Python dispatch, and large
payloads never concatenate into one giant frame.
"""

from __future__ import annotations

import binascii
import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id long, n_bytes long, head_hex string"
FEATURE_SCHEMA = "doc_id long, n_bytes long, feature array<float>"


def binary_meta(df: DataFrame, id_col: str = "doc_id",
                bin_col: str = "payload") -> DataFrame:
    """(id, binary) → (doc_id, n_bytes, head_hex): typed metadata over an
    opaque binary column, batched through Arrow."""
    id_name, bin_name = id_col, bin_col

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[bin_name]
            yield pd.DataFrame({
                "doc_id": pdf[id_name].astype("int64"),
                "n_bytes": payload.map(
                    lambda b: len(b) if b is not None else 0).astype("int64"),
                "head_hex": payload.map(
                    lambda b: binascii.hexlify(b[:8]).decode().upper()
                    if b is not None else ""),
            })

    return df.select(id_col, bin_col).mapInPandas(extract, META_SCHEMA)


def decode_stub(payload: bytes, modality: str = "image") -> list[float]:
    """STUB: media decode + feature extraction.

    The real implementation would decode with PIL/ffmpeg/torchaudio and
    emit an embedding; those libs are absent here. The deterministic fake
    derives an 8-dim feature from the payload's sha256 so tests can
    assert end-to-end plumbing (stable values, correct shapes).
    Raise path kept explicit for the real-codec branch.
    """
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"unknown modality: {modality}")
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(df: DataFrame, modality: str = "image",
                     id_col: str = "doc_id",
                     bin_col: str = "payload") -> DataFrame:
    """(id, binary) → (doc_id, n_bytes, feature array<float>) via the
    (stubbed) decoder, Arrow-batched."""
    id_name, bin_name = id_col, bin_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[bin_name]
            yield pd.DataFrame({
                "doc_id": pdf[id_name].astype("int64"),
                "n_bytes": payload.map(
                    lambda b: len(b) if b is not None else 0).astype("int64"),
                "feature": payload.map(
                    lambda b: decode_stub(b, modality)
                    if b is not None else None),
            })

    return df.select(id_col, bin_col).mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, thumb binary"
FRAME_SCHEMA = "doc_id long, frame_no int, frame binary"


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB: image resize. The real branch decodes with PIL and re-encodes
    at (width, height); absent codecs, the deterministic fake samples
    ``width*height`` bytes evenly from the payload so output size, shape
    metadata, and determinism are all testable."""
    if not payload:
        return b""
    n = max(1, width * height)
    step = max(1, len(payload) // n)
    return payload[::step][:n]


def resize_images(df: DataFrame, width: int = 4, height: int = 4,
                  id_col: str = "doc_id",
                  bin_col: str = "payload") -> DataFrame:
    """(id, binary) → (doc_id, width, height, thumb): Arrow-batched
    thumbnailing; one task streams many batches (mapInPandas iterator)."""
    id_name, bin_name = id_col, bin_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[bin_name]
            yield pd.DataFrame({
                "doc_id": pdf[id_name].astype("int64"),
                "width": width, "height": height,
                "thumb": payload.map(
                    lambda b: resize_stub(b, width, height)
                    if b is not None else None),
            })

    return df.select(id_col, bin_col).mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 4, frame_len: int = 16,
                  id_col: str = "doc_id",
                  bin_col: str = "payload") -> DataFrame:
    """(id, binary video) → one row per sampled frame (doc_id, frame_no,
    frame). STUB frame extraction: real branch seeks keyframes via
    ffmpeg; the fake slices fixed-stride windows so the EXPLODED output
    shape — the part that matters to Spark (row-per-frame fanout,
    partition sizing) — is real.
    """
    id_name, bin_name = id_col, bin_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for doc_id, b in zip(pdf[id_name].astype("int64"),
                                 pdf[bin_name]):
                if b is None:
                    continue
                for fno in range(min(max_frames,
                                     max(1, len(b) // every_n_bytes))):
                    off = fno * every_n_bytes
                    ids.append(doc_id)
                    frame_nos.append(fno)
                    frames.append(bytes(b[off:off + frame_len]))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_no": pd.Series(frame_nos, dtype="int32"),
                "frame": pd.Series(frames, dtype=object),
            })

    return df.select(id_col, bin_col).mapInPandas(run, FRAME_SCHEMA)


def with_payload(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Test/demo helper: synthesize an opaque binary payload column from
    text (utf-8 bytes) — stands in for an image/audio blob."""
    return docs.select(F.col(id_col),
                       F.encode(F.col(text_col), "utf-8").alias("payload"))
