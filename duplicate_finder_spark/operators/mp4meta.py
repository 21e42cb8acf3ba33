"""MP4 (ISO-BMFF) container metadata via a real box walk.

The AVI path samples and decodes real frames (operators/avicodec.py +
jpegcodec.py); for MP4 the codec payloads (H.264/AAC) are genuinely
out of sandbox, but the CONTAINER is a pure length-prefixed box tree,
and a curation pass needs exactly what it holds: duration, timescale,
brand, track count and types. This walks it with stdlib ``struct``:

- top-level boxes: 32-bit size + fourcc (size 1 ⇒ 64-bit largesize,
  size 0 ⇒ to end of file),
- ``ftyp`` → major brand,
- ``moov`` → recurse: ``mvhd`` (version 0/1 timescale + duration),
  one ``trak`` per track, each ``trak``→``mdia``→``hdlr`` handler
  type (vide/soun/...).

Malformed boxes (truncated, zero-size loop, overrun) end the walk —
whatever parsed so far stands, else null metadata (error-row skip).
The scripted writer builds bit-valid files for tests and the driver
gate — the prove-it-with-a-writer pattern of the mp3/JPEG/PNG/GIF
modules. ``mapInPandas`` over the binary column: no shuffle, bytes
never leave the executor.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame

__all__ = ["mp4_boxes", "mp4_meta_dict", "encode_mp4", "mp4_meta"]


def mp4_boxes(b: bytes, start: int = 0, end: int | None = None):
    """Yield (fourcc, payload_start, payload_end) for each box in
    [start, end); stops at the first malformed box."""
    end = len(b) if end is None else end
    i = start
    while i + 8 <= end:
        size = struct.unpack_from(">I", b, i)[0]
        cc = b[i + 4:i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                return
            size = struct.unpack_from(">Q", b, i + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            return
        yield cc, i + hdr, i + size
        i += size


def _hdlr_type(b: bytes, s: int, e: int) -> str | None:
    # hdlr: version/flags(4) pre_defined(4) handler_type(4) ...
    return b[s + 8:s + 12].decode("latin1") if e - s >= 12 else None


def mp4_meta_dict(b: bytes) -> dict | None:
    """Container metadata, or None when no valid top-level box parses."""
    brand = None
    timescale = duration = None
    n_video = n_audio = n_other = 0
    seen = False
    for cc, s, e in mp4_boxes(b):
        seen = True
        if cc == b"ftyp" and e - s >= 4:
            brand = b[s:s + 4].decode("latin1")
        elif cc == b"moov":
            for cc2, s2, e2 in mp4_boxes(b, s, e):
                if cc2 == b"mvhd" and e2 - s2 >= 4:
                    ver = b[s2]
                    if ver == 1 and e2 - s2 >= 28:
                        timescale = struct.unpack_from(">I", b, s2 + 20)[0]
                        duration = struct.unpack_from(">Q", b, s2 + 24)[0]
                    elif ver == 0 and e2 - s2 >= 20:
                        timescale = struct.unpack_from(">I", b, s2 + 12)[0]
                        duration = struct.unpack_from(">I", b, s2 + 16)[0]
                elif cc2 == b"trak":
                    kind = None
                    for cc3, s3, e3 in mp4_boxes(b, s2, e2):
                        if cc3 == b"mdia":
                            for cc4, s4, e4 in mp4_boxes(b, s3, e3):
                                if cc4 == b"hdlr":
                                    kind = _hdlr_type(b, s4, e4)
                    if kind == "vide":
                        n_video += 1
                    elif kind == "soun":
                        n_audio += 1
                    else:
                        n_other += 1
    if not seen:
        return None
    dur_ms = (round(duration * 1000.0 / timescale, 3)
              if timescale and duration is not None else None)
    return {"brand": brand, "timescale": timescale,
            "duration_ms": dur_ms, "n_video": n_video,
            "n_audio": n_audio, "n_other": n_other}


def _box(cc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + cc + payload


def encode_mp4(brand: str = "isom", timescale: int = 1000,
               duration: int = 0, tracks: tuple[str, ...] = (),
               mvhd_version: int = 0) -> bytes:
    """Minimal bit-valid ISO-BMFF file: ftyp + moov(mvhd + trak per
    entry in ``tracks``, each with mdia>hdlr of that handler type)."""
    ftyp = _box(b"ftyp", brand.encode("latin1") + struct.pack(">I", 0)
                + b"isommp42")
    if mvhd_version == 1:
        mvhd_payload = (bytes([1, 0, 0, 0]) + bytes(16)
                        + struct.pack(">IQ", timescale, duration)
                        + bytes(80))
    else:
        mvhd_payload = (bytes(4) + bytes(8)
                        + struct.pack(">II", timescale, duration)
                        + bytes(80))
    inner = _box(b"mvhd", mvhd_payload)
    for kind in tracks:
        hdlr = _box(b"hdlr", bytes(8) + kind.encode("latin1") + bytes(13))
        inner += _box(b"trak", _box(b"mdia", hdlr))
    return ftyp + _box(b"moov", inner) + _box(b"free", bytes(4))


def mp4_meta(df: DataFrame, id_col: str = "doc_id",
             payload_col: str = "payload") -> DataFrame:
    """(id, brand, timescale, duration_ms, n_video, n_audio, n_other);
    unparseable payloads yield a null-metadata row (F6 semantics)."""
    import pandas as pd

    schema = (f"{id_col} long, brand string, timescale long, "
              "duration_ms double, n_video long, n_audio long, "
              "n_other long")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                m = mp4_meta_dict(bytes(payload)) \
                    if payload is not None else None
                rows.append((i,) + ((None,) * 6 if m is None else
                            (m["brand"], m["timescale"], m["duration_ms"],
                             m["n_video"], m["n_audio"], m["n_other"])))
            yield pd.DataFrame(rows, columns=[
                id_col, "brand", "timescale", "duration_ms",
                "n_video", "n_audio", "n_other"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)
