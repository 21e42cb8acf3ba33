"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns; all Spark-side
mechanics — schema, Arrow batch shape, partition sizing, UDF signatures —
are real and tested. Media decode is REAL for container-free raster
formats (PPM P6 and uncompressed 24-bit BMP — ``decode_image``, pure
numpy, no codec libraries needed); codec formats (JPEG/PNG/video/audio)
fall back to the explicit ``decode_stub`` (PIL/ffmpeg are not in this
container), whose deterministic fake keeps downstream feature logic
exercisable end-to-end.

Pattern: ``mapInPandas`` (iterator of pandas batches) so one task
processes many Arrow batches without per-row Python dispatch, and large
payloads never concatenate into one giant frame.
"""

from __future__ import annotations

import binascii
import hashlib
from collections.abc import Iterator

import numpy as np
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
    """STUB: media decode + feature extraction for CODEC formats.

    The real implementation would decode with PIL/ffmpeg/torchaudio and
    emit an embedding; those libs are absent here. The deterministic fake
    derives an 8-dim feature from the payload's sha256 so tests can
    assert end-to-end plumbing (stable values, correct shapes).
    Raise path kept explicit for the real-codec branch. Container-free
    raster formats don't need this — see ``decode_image``.
    """
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"unknown modality: {modality}")
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def _decode_ppm(b: bytes) -> np.ndarray | None:
    """PPM P6 (binary RGB, maxval 255) → HxWx3 uint8, or None."""
    if not b.startswith(b"P6"):
        return None
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3 and i < len(b):
        while i < len(b) and b[i:i + 1].isspace():
            i += 1
        if b[i:i + 1] == b"#":  # comment runs to end of line
            j = b.find(b"\n", i)
            i = j + 1 if j >= 0 else len(b)
            continue
        j = i
        while j < len(b) and not b[j:j + 1].isspace():
            j += 1
        toks.append(b[i:j])
        i = j
    i += 1  # exactly one whitespace byte after maxval, then pixel data
    try:
        w, h, maxv = (int(t) for t in toks)
    except ValueError:
        return None
    if maxv != 255 or w <= 0 or h <= 0 or len(b) < i + w * h * 3:
        return None
    return np.frombuffer(b, dtype=np.uint8, count=w * h * 3,
                         offset=i).reshape(h, w, 3)


def _decode_bmp(b: bytes) -> np.ndarray | None:
    """Uncompressed 24-bit BI_RGB BMP → HxWx3 uint8 (RGB), or None."""
    if b[:2] != b"BM" or len(b) < 54:
        return None
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4  # rows pad to 4 bytes
    if len(b) < off + stride * h:
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)[:, :w * 3]
    img = rows.reshape(h, w, 3)
    if bottom_up:
        img = img[::-1]
    return img[..., ::-1]  # BGR → RGB


def decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """REAL decode for container-free audio: RIFF/WAVE with 8- or 16-bit
    integer PCM → (samples float64 in [-1, 1] mono-mixed, sample_rate),
    in pure numpy. None for compressed codecs (mp3/aac/…)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, n = 12, len(payload)
    fmt = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt != 1 or channels < 1 or bits not in (8, 16) \
                    or rate <= 0:
                return None  # non-PCM (or corrupt header) needs a codec
            fmt = (channels, rate, bits)
        elif cid == b"data" and fmt is not None:
            channels, rate, bits = fmt
            if bits == 16:
                raw = np.frombuffer(body, dtype="<i2",
                                    count=len(body) // 2)
                samples = raw.astype(np.float64) / 32768.0
            else:
                raw = np.frombuffer(body, dtype=np.uint8)
                samples = (raw.astype(np.float64) - 128.0) / 128.0
            usable = (samples.size // channels) * channels
            mono = samples[:usable].reshape(-1, channels).mean(axis=1)
            return mono, rate
        pos += 8 + size + (size & 1)  # RIFF chunks pad to even
    return None


def audio_feature(samples: np.ndarray, rate: int) -> list[float]:
    """Deterministic 8-dim feature from decoded PCM: duration, rms,
    peak, zero-crossing rate, and 4-band coarse energy split — the same
    shape the stub emits."""
    if samples.size == 0:
        return [0.0] * 8
    dur = samples.size / rate
    rms = float(np.sqrt(np.mean(samples ** 2)))
    peak = float(np.max(np.abs(samples)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples).astype(
        np.int8)))))
    quarters = np.array_split(samples, 4)
    band = [float(np.sqrt(np.mean(q ** 2))) if q.size else 0.0
            for q in quarters]
    return [round(v, 6) for v in (min(dur / 3600.0, 1.0), rms, peak,
                                  zcr, *band)]


def decode_image(payload: bytes) -> np.ndarray | None:
    """REAL decode for container-free raster formats — PPM P6 and
    uncompressed 24-bit BMP — in pure numpy (no codec libraries).
    Returns HxWx3 uint8 RGB, or None for formats that need a codec
    (JPEG/PNG/…), which fall back to ``decode_stub``."""
    img = _decode_bmp(payload)
    return img if img is not None else _decode_ppm(payload)


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 → PPM P6 bytes (the re-encode side of resize)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def image_feature(img: np.ndarray) -> list[float]:
    """Deterministic 8-dim feature from decoded pixels: normalized
    (h, w) + per-channel mean and std — the same shape the stub emits,
    so downstream similarity operators are agnostic to which path ran."""
    h, w = img.shape[:2]
    px = img.reshape(-1, 3).astype(np.float64)
    mean = px.mean(axis=0) / 255.0
    std = px.std(axis=0) / 255.0
    return [round(float(v), 6) for v in
            (h / 4096.0, w / 4096.0, *mean, *std)]


def extract_features(df: DataFrame, modality: str = "image",
                     id_col: str = "doc_id",
                     bin_col: str = "payload") -> DataFrame:
    """(id, binary) → (doc_id, n_bytes, feature array<float>),
    Arrow-batched. Decodable raster payloads (PPM/BMP) get the REAL
    pixel-statistics feature; codec formats fall back to the stub."""
    id_name, bin_name = id_col, bin_col

    def feat(b: bytes) -> list[float]:
        if modality == "image":
            img = decode_image(b)
            if img is not None:
                return image_feature(img)
        elif modality == "audio":
            wav = decode_wav(b)
            if wav is not None:
                return audio_feature(*wav)
        return decode_stub(b, modality)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[bin_name]
            yield pd.DataFrame({
                "doc_id": pdf[id_name].astype("int64"),
                "n_bytes": payload.map(
                    lambda b: len(b) if b is not None else 0).astype("int64"),
                "feature": payload.map(
                    lambda b: feat(b) if b is not None else None),
            })

    return df.select(id_col, bin_col).mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, thumb binary"
FRAME_SCHEMA = "doc_id long, frame_no int, frame binary"


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize for CODEC formats. The real branch decodes with PIL
    and re-encodes at (width, height); absent codecs, the deterministic
    fake samples ``width*height`` bytes evenly from the payload so
    output size, shape metadata, and determinism are all testable.
    Decodable raster formats take ``resize_image`` instead."""
    if not payload:
        return b""
    n = max(1, width * height)
    step = max(1, len(payload) // n)
    return payload[::step][:n]


def resize_image(payload: bytes, width: int, height: int) -> bytes | None:
    """REAL resize for decodable raster payloads: nearest-neighbor in
    numpy, re-encoded as PPM P6. None if the payload needs a codec."""
    img = decode_image(payload)
    if img is None:
        return None
    h, w = img.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return encode_ppm(img[ys][:, xs])


def resize_images(df: DataFrame, width: int = 4, height: int = 4,
                  id_col: str = "doc_id",
                  bin_col: str = "payload") -> DataFrame:
    """(id, binary) → (doc_id, width, height, thumb): Arrow-batched
    thumbnailing; one task streams many batches (mapInPandas iterator).
    Decodable raster payloads get the REAL nearest-neighbor resize
    (PPM-encoded thumb); codec formats fall back to the stub."""
    id_name, bin_name = id_col, bin_col

    def thumb(b: bytes) -> bytes:
        real = resize_image(b, width, height)
        return real if real is not None else resize_stub(b, width, height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[bin_name]
            yield pd.DataFrame({
                "doc_id": pdf[id_name].astype("int64"),
                "width": width, "height": height,
                "thumb": payload.map(
                    lambda b: thumb(b) if b is not None else None),
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
