"""WARC source: kernel parsing, gzip member streams, and the Spark
read → extract_text end-to-end (input_hint schema parity)."""

from __future__ import annotations

import datetime as dt
import gzip
from pathlib import Path

from duplicate_finder_spark.functions.extraction import with_extracted_text
from duplicate_finder_spark.sources.warc import parse_warc, read_warc


def _record(rtype: bytes, uri: bytes | None = None,
            date: bytes = b"2026-03-01T12:00:00Z",
            payload: bytes = b"") -> bytes:
    hdrs = [b"WARC/1.0", b"WARC-Type: " + rtype]
    if uri is not None:
        hdrs.append(b"WARC-Target-URI: " + uri)
    hdrs.append(b"WARC-Date: " + date)
    hdrs.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(hdrs) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _response(uri: bytes, html: bytes,
              date: bytes = b"2026-03-01T12:00:00Z") -> bytes:
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
    return _record(b"response", uri=uri, date=date, payload=http)


_HTML_A = b"<html><body>alpha page</body></html>"
_HTML_B = b"<html><p>beta \xc3\xa9page</p></html>"  # utf-8 e-acute


def _archive() -> bytes:
    return (_record(b"warcinfo", payload=b"software: test\r\n")
            + _record(b"request", uri=b"http://a.example/",
                      payload=b"GET / HTTP/1.1\r\n\r\n")
            + _response(b"http://a.example/", _HTML_A)
            + _response(b"http://b.example/x", _HTML_B,
                        date=b"2026-03-02T00:30:00Z"))


def test_parse_warc_kernel() -> None:
    recs = list(parse_warc(_archive()))
    assert [(u, h) for u, _, h in recs] == [
        ("http://a.example/", _HTML_A), ("http://b.example/x", _HTML_B)]
    assert recs[0][1] == dt.datetime(2026, 3, 1, 12, 0, 0)
    assert recs[1][1] == dt.datetime(2026, 3, 2, 0, 30, 0)


def test_parse_warc_skips_malformed_and_truncated() -> None:
    bad_len = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: http://bad.example/\r\n"
               b"Content-Length: not-a-number\r\n\r\n")
    truncated = _response(b"http://t.example/", _HTML_A)[:-20]
    data = bad_len + _response(b"http://ok.example/", _HTML_B) + truncated
    recs = list(parse_warc(data))
    # malformed record skipped, good one parsed, truncated tail abandoned
    assert [u for u, _, _ in recs] == ["http://ok.example/"]


def test_parse_warc_gzip_member_stream() -> None:
    # Common Crawl style: each record its own gzip member, concatenated
    gz = b"".join(gzip.compress(r) for r in (
        _record(b"warcinfo", payload=b"x"),
        _response(b"http://a.example/", _HTML_A),
        _response(b"http://b.example/x", _HTML_B)))
    recs = list(parse_warc(gz))
    assert [u for u, _, _ in recs] == ["http://a.example/",
                                      "http://b.example/x"]


def test_read_warc_end_to_end(spark, tmp_path: Path) -> None:
    (tmp_path / "seg-00000.warc").write_bytes(_archive())
    (tmp_path / "seg-00001.warc.gz").write_bytes(
        gzip.compress(_response(b"http://c.example/",
                                b"<html>gamma</html>")))
    (tmp_path / "ignored.txt").write_bytes(b"not an archive")

    pages = read_warc(spark, str(tmp_path))
    assert pages.schema.simpleString() == (
        "struct<url:string,warc_ts:timestamp,html:binary,"
        "text:string,lang:string>")
    out = {r["url"]: r for r in
           with_extracted_text(pages, errors="strict").collect()}
    assert set(out) == {"http://a.example/", "http://b.example/x",
                       "http://c.example/"}
    assert out["http://a.example/"]["text"] == "alpha page"
    assert out["http://b.example/x"]["text"] == "beta épage"
    assert out["http://c.example/"]["text"] == "gamma"
    assert bytes(out["http://b.example/x"]["html"]) == _HTML_B
    assert out["http://a.example/"]["warc_ts"] == dt.datetime(
        2026, 3, 1, 12, 0, 0)


def test_read_warc_stream_dedups_across_segments(spark, tmp_path: Path) -> None:
    """Continuous-crawl ingest: segments stream in one file per trigger
    and the watermarked dedup keeps first-seen across micro-batches."""
    from duplicate_finder_spark.streaming.dedup import (run_stream_to_memory,
                                                        streaming_exact_dedup)
    from duplicate_finder_spark.sources.warc import read_warc_stream

    seg = tmp_path / "crawl"
    seg.mkdir()
    same = b"<html><body>repeated</body></html>"
    (seg / "s0.warc").write_bytes(
        _response(b"http://a.example/", same,
                  date=b"2026-03-01T12:00:00Z"))
    (seg / "s1.warc").write_bytes(
        _response(b"http://b.example/", same,          # cross-segment dup
                  date=b"2026-03-01T12:01:00Z")
        + _response(b"http://c.example/", b"<html>fresh</html>",
                    date=b"2026-03-01T12:02:00Z"))

    stream = read_warc_stream(spark, str(seg), max_files_per_trigger=1)
    assert stream.isStreaming
    pages = with_extracted_text(stream)
    dedup = streaming_exact_dedup(pages, watermark="10 minutes")
    run_stream_to_memory(dedup, "warc_dedup_out")
    out = spark.sql("SELECT url, text FROM warc_dedup_out").collect()
    assert sorted(r["text"] for r in out) == ["fresh", "repeated"]
    # first-SEEN-wins: exactly one of the dup pair survives (which one
    # depends on segment arrival order, which the file source does not
    # promise); the unique page always survives
    urls = {r["url"] for r in out}
    assert "http://c.example/" in urls and len(urls) == 2
    assert len(urls & {"http://a.example/", "http://b.example/"}) == 1
