"""WARC ingestion: Common-Crawl-style web archives → the engine's pages
schema ``(url, warc_ts, html, text, lang)`` (BASELINE.json input_hint).

The reference ingests a directory walk of local files
(duplicate_finder.py:110-141 os.walk → per-file stat/read); at web
scale the unit of ingestion is the WARC segment instead. Spark shape:

* ``binaryFile`` scan — one task per archive. Common Crawl segments are
  ~1 GiB, which IS the natural partition grain: a segment must be
  parsed sequentially (records are length-prefixed, not splittable),
  and 1 GiB tasks keep a 1000-executor scan busy without tiny-task
  scheduling overhead. Thousands of segments ⇒ thousands of tasks.
* ``mapInPandas`` record parser — Arrow-batched iterator, pure Python
  only inside the per-archive loop (the format is bytes-oriented; there
  is nothing vectorizable about scanning length-prefixed records, and
  the downstream operators take over in JVM/Arrow land immediately).
* gzipped archives (``.warc.gz``) decompress transparently:
  ``gzip.decompress`` handles the member-per-record concatenation
  Common Crawl uses.

Error posture (F6, error-row skip): malformed records are skipped and a
truncated tail abandons THAT archive only — a crawl segment with a bad
record must never fail the stage. ``text``/``lang`` are emitted NULL;
``functions.extraction.with_extracted_text`` fills ``text`` downstream
(byte-identity invariant lives there, not here).
"""

from __future__ import annotations

import datetime as dt
import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")

_GZIP_MAGIC = b"\x1f\x8b"


def _parse_headers(block: bytes) -> dict[bytes, bytes]:
    headers: dict[bytes, bytes] = {}
    for line in block.split(b"\r\n"):
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().lower()] = v.strip()
    return headers


def _parse_ts(raw: bytes | None) -> dt.datetime | None:
    if not raw:
        return None
    try:
        # WARC-Date is ISO-8601 Zulu (ISO 28500 §5.4)
        return dt.datetime.fromisoformat(
            raw.decode("ascii").replace("Z", "+00:00")
        ).replace(tzinfo=None)
    except ValueError:
        return None


def parse_warc(data: bytes) -> Iterator[tuple[str, dt.datetime | None,
                                              bytes]]:
    """One archive's bytes → (url, warc_ts, html) per response record.

    Pure kernel (no Spark) so tests and the UDF share it. Skips
    warcinfo/request/metadata records; stops at a truncated tail.
    """
    if data[:2] == _GZIP_MAGIC:
        data = gzip.decompress(data)  # multi-member streams supported
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            return
        headers = _parse_headers(data[start:head_end])
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            pos = head_end + 4  # malformed record: skip, keep scanning
            continue
        body_start = head_end + 4
        body_end = body_start + length
        if body_end > n:
            return  # truncated tail: abandon this archive only
        pos = body_end
        if headers.get(b"warc-type") != b"response":
            continue
        uri = headers.get(b"warc-target-uri")
        if not uri:
            continue
        payload = data[body_start:body_end]
        # response payload is an HTTP message: headers, blank line, body
        http_end = payload.find(b"\r\n\r\n")
        html = payload[http_end + 4:] if http_end >= 0 else payload
        yield (uri.decode("utf-8", "replace"),
               _parse_ts(headers.get(b"warc-date")), html)


_BINARYFILE_SCHEMA = ("path string, modificationTime timestamp, "
                      "length long, content binary")


def read_warc_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int = 16) -> DataFrame:
    """Continuous-crawl ingestion: new ``.warc``/``.warc.gz`` segments
    landing under ``path`` stream through the same record parser
    (``binaryFile`` file-stream source discovers whole files — exactly
    how crawl segments arrive — and the parse is stateless, so it
    composes with ``streaming.dedup.streaming_exact_dedup`` whose
    watermark bounds the dedup state). Same output schema as
    ``read_warc``."""
    raw = (spark.readStream.format("binaryFile")
           .schema(_BINARYFILE_SCHEMA)
           .option("pathGlobFilter", "*.warc*")
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .load(path)
           .select("content"))
    return raw.mapInPandas(_parse_batches, schema=PAGES_SCHEMA)


def _parse_batches(batches: Iterator[pd.DataFrame]
                   ) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        for content in pdf["content"]:
            recs = list(parse_warc(bytes(content)))
            if recs:
                yield pd.DataFrame({
                    "url": [r[0] for r in recs],
                    "warc_ts": [r[1] for r in recs],
                    "html": [r[2] for r in recs],
                    "text": pd.Series([None] * len(recs),
                                      dtype="object"),
                    "lang": pd.Series([None] * len(recs),
                                      dtype="object"),
                })


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive(s) at ``path`` → pages DataFrame
    ``(url, warc_ts, html, text=NULL, lang=NULL)``."""
    raw = (spark.read.format("binaryFile")
           .option("recursiveFileLookup", "true")
           .option("pathGlobFilter", "*.warc*")
           .load(path)
           .select("content"))
    return raw.mapInPandas(_parse_batches, schema=PAGES_SCHEMA)
