"""MP3 stream metadata via a real MPEG-1 Layer III frame walk.

Full mp3 AUDIO decode (Huffman + IMDCT + synthesis filterbank) stays an
honest out-of-sandbox stub (operators/multimodal.py:decode_stub), but a
training pipeline's audio-curation pass mostly needs STREAM METADATA —
duration, bitrate profile, CBR/VBR, sample rate — and that requires
only the frame headers, which are fully parseable in pure Python:

- ID3v2 tag skip (syncsafe 28-bit size),
- sync scan (11 set bits) with single-byte resync on junk,
- MPEG-1 Layer III header fields: bitrate index, sample-rate index,
  padding bit; frame length = 144·bitrate/sample_rate + padding,
- 1152 samples per frame ⇒ exact duration; per-frame bitrates ⇒ mean
  bitrate and VBR flag; truncated tail frames are dropped.

The scripted writer (``encode_mp3_stream``) builds bit-valid streams so
tests and the driver gate exercise the parser against known-answer
frames — the same prove-it-with-a-writer pattern as the progressive
JPEG and PNG/GIF codecs.

Scale: metadata extraction is a ``mapInPandas`` over the binary column
— embarrassingly parallel, no shuffle, bytes never leave the executor.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["BITRATES_KBPS", "SAMPLE_RATES", "mp3_frames",
           "encode_mp3_stream", "mp3_stream_meta"]

# MPEG-1 Layer III tables (index 0 = "free format" and 15 = invalid)
BITRATES_KBPS = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                 224, 256, 320)
SAMPLE_RATES = (44100, 48000, 32000, None)
_SAMPLES_PER_FRAME = 1152


def mp3_frames(b: bytes) -> dict | None:
    """Walk a byte stream; return stream metadata or None if no frame.

    Skips a leading ID3v2 tag, resyncs byte-by-byte across junk, stops
    at a truncated tail frame. Frames with free-format/invalid bitrate
    or reserved sample rate are not frames (scan continues).
    """
    i = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) | \
               ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        i = 10 + size
    n = 0
    brs: list[int] = []
    sr = None
    while i + 4 <= len(b):
        if b[i] != 0xFF or (b[i + 1] & 0xE0) != 0xE0:
            i += 1
            continue
        version = (b[i + 1] >> 3) & 3
        layer = (b[i + 1] >> 1) & 3
        if version != 3 or layer != 1:  # MPEG-1, Layer III only
            i += 1
            continue
        bri = (b[i + 2] >> 4) & 0xF
        sri = (b[i + 2] >> 2) & 3
        pad = (b[i + 2] >> 1) & 1
        if bri in (0, 15) or sri == 3:
            i += 1
            continue
        s = SAMPLE_RATES[sri]
        if sr is not None and s != sr:
            i += 1  # sample-rate change mid-stream: not our frame
            continue
        kbps = BITRATES_KBPS[bri]
        flen = (144 * kbps * 1000) // s + pad
        if i + flen > len(b):
            break  # truncated tail frame
        if sr is None:
            sr = s
        n += 1
        brs.append(kbps)
        i += flen
    if n == 0:
        return None
    return {
        "n_frames": n,
        "sample_rate": sr,
        "duration_ms": round(n * _SAMPLES_PER_FRAME * 1000.0 / sr, 3),
        "bitrate_kbps": round(sum(brs) / n, 6),
        "vbr": any(x != brs[0] for x in brs),
    }


def encode_mp3_stream(frames: list[tuple[int, int]], sri: int = 0,
                      id3_size: int = 0, junk_prefix: int = 0) -> bytes:
    """Bit-valid MPEG-1 Layer III stream from (bitrate_index, padding)
    pairs; payload bytes are zeros (no false sync possible). Optional
    ID3v2 tag and/or junk bytes in front exercise the skip/resync
    paths."""
    out = bytearray()
    if id3_size:
        out += b"ID3\x04\x00\x00" + bytes(
            [(id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
             (id3_size >> 7) & 0x7F, id3_size & 0x7F]) + bytes(id3_size)
    out += bytes(junk_prefix)
    s = SAMPLE_RATES[sri]
    for bri, pad in frames:
        kbps = BITRATES_KBPS[bri]
        if kbps is None:
            raise ValueError(f"invalid bitrate index {bri}")
        flen = (144 * kbps * 1000) // s + pad
        hdr = bytes([0xFF, 0xFB, (bri << 4) | (sri << 2) | (pad << 1),
                     0xC0])  # mono, no mode-ext/copyright/emphasis
        out += hdr + bytes(flen - 4)
    return bytes(out)


def mp3_stream_meta(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """(id, n_frames, sample_rate, duration_ms, bitrate_kbps, vbr) per
    stream; streams with no parseable frame yield a null-metadata row
    (error-row skip, reference F6 semantics)."""
    import pandas as pd

    schema = (f"{id_col} long, n_frames long, sample_rate long, "
              "duration_ms double, bitrate_kbps double, vbr boolean")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                m = mp3_frames(bytes(payload)) if payload is not None \
                    else None
                rows.append((i, *(None,) * 4, None) if m is None else
                            (i, m["n_frames"], m["sample_rate"],
                             m["duration_ms"], m["bitrate_kbps"],
                             m["vbr"]))
            yield pd.DataFrame(rows, columns=[
                id_col, "n_frames", "sample_rate", "duration_ms",
                "bitrate_kbps", "vbr"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)
